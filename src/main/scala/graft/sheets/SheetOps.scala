package graft.sheets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Missing or reordered header row (≙ reference expected_headers check,
  * sheets.py:216-253). */
final class HeaderMismatchException(msg: String) extends RuntimeException(msg)

/** Small-table worksheet operators (≙ reference gcpde/sheets.py).
  *
  * The reference talks to Google Sheets; the engine models a spreadsheet
  * document as a directory and each worksheet as one headered CSV file —
  * same shape: small, row-oriented, stringly-typed. Semantics preserved:
  *
  *   - reads coerce EVERY value to string and `"" → NULL`
  *     (sheets.py:250-253, fixture A7);
  *   - replace writes `[columns] + rows` atomically with optional column
  *     projection (sheets.py:86-117);
  *   - replace-or-create creates the worksheet when absent
  *     (sheets.py:120-169); list/delete enumerate and drop worksheets
  *     (sheets.py:172-213).
  *
  * Sheets are driver-small by contract (the reference materializes them as
  * Python lists), so single-file writes are intentional, not a scale bug.
  */
object SheetOps {

  private def wsPath(doc: String, sheet: String) = s"$doc/$sheet.csv"

  private def fs(spark: SparkSession, doc: String): FileSystem =
    FileSystem.get(new java.net.URI(doc), spark.sparkContext.hadoopConfiguration)

  /** ≙ read_sheet: header row → column names, all values string, ""→NULL.
    * `head` picks WHICH row is the header, 1-based in spreadsheet
    * numeration (≙ gspread get_all_records(head=...), sheets.py:220-232):
    * rows above it — title rows, merged banners — are ignored, rows below
    * it are the data. */
  def readSheet(spark: SparkSession, doc: String, sheet: String,
                expectedHeaders: Option[Seq[String]] = None,
                head: Int = 1): DataFrame = {
    require(head >= 1, s"head must be >= 1 (spreadsheet row numeration), got $head")
    val raw =
      if (head == 1) spark.read.option("header", "true").csv(wsPath(doc, sheet))
      else {
        // Sheets are driver-small by contract, so parse driver-side with
        // the CSV parser Spark itself bundles (univocity). Spark's own CSV
        // reader sizes the schema from the FIRST row — a one-cell title
        // row above the header would silently truncate every data row to
        // one column; here the header row defines the width and short rows
        // pad with NULL (≙ a spreadsheet grid's empty cells).
        import scala.jdk.CollectionConverters._
        val f = fs(spark, doc)
        val dir = new Path(wsPath(doc, sheet))
        val parts = f.listStatus(dir).toSeq.map(_.getPath)
          .filter(p => !p.getName.startsWith(".") && !p.getName.startsWith("_"))
          .sortBy(_.getName)
        val settings = new com.univocity.parsers.csv.CsvParserSettings
        settings.setMaxColumns(16384)
        // Match the head==1 Spark CSV reader: unbounded cell length
        // (univocity's default 4096 chars throws on long cells Spark
        // accepts) and no whitespace trimming of unquoted values.
        settings.setMaxCharsPerColumn(-1)
        settings.setIgnoreLeadingWhitespaces(false)
        settings.setIgnoreTrailingWhitespaces(false)
        val parser = new com.univocity.parsers.csv.CsvParser(settings)
        val rows = parts.flatMap { p =>
          val in = f.open(p)
          try parser.parseAll(new java.io.InputStreamReader(in,
            java.nio.charset.StandardCharsets.UTF_8)).asScala.toSeq
          finally in.close()
        }
        if (rows.length < head)
          throw new HeaderMismatchException(
            s"worksheet $sheet has no row $head to use as header")
        val names = rows(head - 1).map(v => Option(v).getOrElse("")).toSeq
        val data = rows.drop(head).map(r =>
          Row.fromSeq(names.indices.map(i => if (i < r.length) r(i) else null)))
        spark.createDataFrame(data.asJava,
          StructType(names.map(StructField(_, StringType, nullable = true))))
      }
    expectedHeaders.foreach { exp =>
      if (raw.columns.toSeq != exp)
        throw new HeaderMismatchException(
          s"worksheet $sheet headers ${raw.columns.toSeq} != expected $exp")
    }
    raw.select(raw.columns.map(c =>
      when(col(c) === "", lit(null)).otherwise(col(c).cast("string")).as(c)): _*)
  }

  /** ≙ read_sheets: all (or the named) worksheets as a name→DataFrame map. */
  def readSheets(spark: SparkSession, doc: String,
                 sheets: Option[Seq[String]] = None): Map[String, DataFrame] =
    sheets.getOrElse(listWorksheets(spark, doc))
      .map(s => s -> readSheet(spark, doc, s)).toMap

  /** ≙ replace_from_records: full overwrite, optional column projection,
    * everything written as strings. */
  def replaceFromRecords(df: DataFrame, doc: String, sheet: String,
                         columns: Option[Seq[String]] = None): Unit = {
    val proj = columns.fold(df)(cs => df.select(cs.map(col): _*))
    proj.select(proj.columns.map(c => col(c).cast("string").as(c)): _*)
      .coalesce(1) // sheets are driver-small by contract
      .write.mode("overwrite").option("header", "true").csv(wsPath(doc, sheet))
  }

  /** Grid capacity of a worksheet (≙ gspread's row_count/col_count — the
    * sheet's allocated size, not its data size). */
  final case class WorksheetCapacity(rows: Long, cols: Int)

  private def metaPath(doc: String, sheet: String) = new Path(s"$doc/$sheet.meta.json")

  /** Allocated capacity, if the worksheet exists. A sheet written without
    * capacity metadata (plain replace) reports its data dimensions. */
  def worksheetCapacity(spark: SparkSession, doc: String,
                        sheet: String): Option[WorksheetCapacity] = {
    val f = fs(spark, doc)
    val mp = metaPath(doc, sheet)
    if (f.exists(mp)) {
      val in = f.open(mp)
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        Some(WorksheetCapacity(n.get("rows").asLong, n.get("cols").asInt))
      } finally in.close()
    } else if (f.exists(new Path(wsPath(doc, sheet)))) {
      val df = readSheet(spark, doc, sheet)
      Some(WorksheetCapacity(df.count() + 1, df.columns.length))
    } else None
  }

  private def writeCapacity(spark: SparkSession, doc: String, sheet: String,
                            cap: WorksheetCapacity): Unit = {
    val out = fs(spark, doc).create(metaPath(doc, sheet), true)
    try out.write(s"""{"rows":${cap.rows},"cols":${cap.cols}}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** ≙ replace_or_create_from_records (sheets.py:120-169): creates the
    * worksheet when absent with `rows = max(min_rows, len+1)`; resizes an
    * existing one to `rows = max(current, min_rows, len+1)`, `cols =
    * max(current, len(columns))` — capacity only grows — then clears and
    * writes header + rows. Capacity is modeled as a sidecar meta file (the
    * CSV itself holds only data, like a Sheets grid holds empty cells). */
  def replaceOrCreateFromRecords(df: DataFrame, doc: String, sheet: String,
                                 columns: Option[Seq[String]] = None,
                                 minRows: Long = 100L): WorksheetCapacity = {
    val spark = df.sparkSession
    val nCols = columns.fold(df.columns.length)(_.length)
    val requiredRows = df.count() + 1 // data + header (sheets.py:149)
    val cap = worksheetCapacity(spark, doc, sheet) match {
      case None =>
        WorksheetCapacity(math.max(minRows, requiredRows), nCols) // create
      case Some(c) =>
        WorksheetCapacity(Seq(c.rows, minRows, requiredRows).max,
          math.max(c.cols, nCols)) // resize-to-max
    }
    replaceFromRecords(df, doc, sheet, columns)
    writeCapacity(spark, doc, sheet, cap)
    cap
  }

  /** ≙ list_worksheets. */
  def listWorksheets(spark: SparkSession, doc: String): Seq[String] = {
    val p = new Path(doc)
    val f = fs(spark, doc)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".csv")).map(_.stripSuffix(".csv")).sorted
  }

  /** ≙ delete_worksheet (idempotent, warn-style false when absent). */
  def deleteWorksheet(spark: SparkSession, doc: String, sheet: String): Boolean = {
    val f = fs(spark, doc)
    f.delete(metaPath(doc, sheet), false)
    f.delete(new Path(wsPath(doc, sheet)), true)
  }
}
