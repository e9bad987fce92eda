package graft.sheets

import graft.SparkSpec

class SheetOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fixture A7: read coerces every value to string, empty string → null") {
    val doc = tmpDir("sheetdoc")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(doc, "ws.csv"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(doc, "ws.csv", "part-0.csv"),
      "col,num\nvalue,123\n,45\n")
    val out = SheetOps.readSheet(spark, doc, "ws")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(out == Seq((Some("value"), Some("123")), (None, Some("45"))))
    assert(SheetOps.readSheet(spark, doc, "ws").schema.fields
      .forall(_.dataType.typeName == "string")) // numbers become strings
  }

  test("expected_headers mismatch raises") {
    val doc = tmpDir("sheetdoc2")
    SheetOps.replaceFromRecords(Seq((1, "a")).toDF("id", "name"), doc, "ws")
    intercept[HeaderMismatchException] {
      SheetOps.readSheet(spark, doc, "ws", expectedHeaders = Some(Seq("wrong", "name")))
    }
    // correct headers pass
    SheetOps.readSheet(spark, doc, "ws", expectedHeaders = Some(Seq("id", "name")))
  }

  test("replace overwrites fully; column projection applies (sheets.py:86-117)") {
    val doc = tmpDir("sheetdoc3")
    SheetOps.replaceFromRecords(Seq((1, "a", true), (2, "b", false)).toDF("id", "name", "f"),
      doc, "ws", columns = Some(Seq("name", "id")))
    val df = SheetOps.readSheet(spark, doc, "ws")
    assert(df.columns.toSeq == Seq("name", "id"))
    SheetOps.replaceFromRecords(Seq((9, "z", true)).toDF("id", "name", "f"), doc, "ws")
    assert(SheetOps.readSheet(spark, doc, "ws").count() == 1) // full replace
  }

  test("list / delete worksheets; readSheets maps all") {
    val doc = tmpDir("sheetdoc4")
    SheetOps.replaceFromRecords(Seq(Tuple1(1)).toDF("x"), doc, "alpha")
    SheetOps.replaceFromRecords(Seq(Tuple1(2)).toDF("x"), doc, "beta")
    assert(SheetOps.listWorksheets(spark, doc) == Seq("alpha", "beta"))
    assert(SheetOps.readSheets(spark, doc).keySet == Set("alpha", "beta"))
    assert(SheetOps.deleteWorksheet(spark, doc, "alpha"))
    assert(!SheetOps.deleteWorksheet(spark, doc, "alpha")) // idempotent-false
    assert(SheetOps.listWorksheets(spark, doc) == Seq("beta"))
  }
}
