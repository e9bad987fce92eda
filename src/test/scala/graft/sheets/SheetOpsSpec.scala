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

  test("head=N: row N is the header, title rows above it are ignored (sheets.py:220-232)") {
    val doc = tmpDir("sheetdoc_head")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(doc, "ws.csv"))
    // title rows are NARROWER than the header (the normal spreadsheet
    // shape — a one-cell banner): the header row must still define the
    // column count, and a short data row pads with NULL
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(doc, "ws.csv", "part-0.csv"),
      "Quarterly report\nGenerated 2026-07-01\nid,name\n1,a\n2,\n3\n")
    val df = SheetOps.readSheet(spark, doc, "ws", head = 3)
    assert(df.columns.toSeq == Seq("id", "name"))
    val out = df.as[(Option[String], Option[String])].collect().toSeq
    assert(out == Seq((Some("1"), Some("a")), (Some("2"), None), // ""→NULL holds
      (Some("3"), None))) // ragged row padded
    // expected_headers composes with head
    intercept[HeaderMismatchException] {
      SheetOps.readSheet(spark, doc, "ws", expectedHeaders = Some(Seq("id", "name")), head = 2)
    }
    // header row beyond the sheet raises
    intercept[HeaderMismatchException] {
      SheetOps.readSheet(spark, doc, "ws", head = 99)
    }
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

  test("create sizes capacity to max(min_rows, len+1) (≙ test_sheets create case)") {
    val doc = tmpDir("sheetdoc5")
    // mirror: 1 record, 2 columns, min_rows=10 → rows=10, cols=2
    val cap = SheetOps.replaceOrCreateFromRecords(
      Seq(("2026-07-20", "1")).toDF("date", "count"), doc, "2026-07-20",
      minRows = 10L)
    assert(cap == SheetOps.WorksheetCapacity(10L, 2))
    // many records beat min_rows: 12 records + header > 10
    val cap2 = SheetOps.replaceOrCreateFromRecords(
      (1 to 12).map(i => (s"d$i", s"$i")).toDF("date", "count"), doc, "big",
      minRows = 10L)
    assert(cap2 == SheetOps.WorksheetCapacity(13L, 2))
  }

  test("replace resizes capacity to max(current, min_rows, len+1) — capacity only grows") {
    val doc = tmpDir("sheetdoc6")
    val c0 = SheetOps.replaceOrCreateFromRecords(
      (1 to 30).map(i => (s"$i", s"v$i")).toDF("id", "v"), doc, "ws", minRows = 10L)
    assert(c0 == SheetOps.WorksheetCapacity(31L, 2))
    // fewer rows, extra column: rows keep the old 31, cols grow to 3
    val c1 = SheetOps.replaceOrCreateFromRecords(
      Seq(("1", "a", "x")).toDF("id", "v", "w"), doc, "ws", minRows = 10L)
    assert(c1 == SheetOps.WorksheetCapacity(31L, 3))
    assert(SheetOps.worksheetCapacity(spark, doc, "ws").contains(c1))
    // data itself was fully replaced
    assert(SheetOps.readSheet(spark, doc, "ws").count() == 1)
  }

  test("capacity sidecar is not listed as a worksheet and dies with the sheet") {
    val doc = tmpDir("sheetdoc7")
    SheetOps.replaceOrCreateFromRecords(Seq(Tuple1("1")).toDF("x"), doc, "ws")
    assert(SheetOps.listWorksheets(spark, doc) == Seq("ws"))
    assert(SheetOps.deleteWorksheet(spark, doc, "ws"))
    assert(SheetOps.worksheetCapacity(spark, doc, "ws").isEmpty)
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
