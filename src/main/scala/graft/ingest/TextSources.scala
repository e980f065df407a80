package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion front door (reference S1–S7,
  * `/root/reference/micro-infobot/app.py:191-205`).
  *
  * The reference accepts pdf/csv/xlsx/html/xml uploads, extracts text from
  * each, and concatenates everything into one corpus string. Here each
  * format is a reader producing `(doc_id, text, source)` rows — per-document
  * rows instead of one blob (the blob is a scaling anti-pattern; the union
  * preserves the concat semantics observably) — and extraction is pure
  * column expressions (codegen'd, no UDF) so it runs inside the scan stage.
  */
object TextSources {

  /** S1: raw-file scan + extension dispatch. One row per file:
    * `(path, ext, content BINARY)`. `binaryFile` is Spark's built-in
    * splittable whole-file reader, so a 100 TB landing dir fans out one
    * file per task with no driver listing bottleneck beyond the catalog.
    */
  def readRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        col("path"),
        lower(element_at(split(col("path"), "\\."), -1)).as("ext"),
        col("content"))

  /** S2/S3: HTML/XML → visible text. The reference uses
    * `BeautifulSoup(...).get_text()` (app.py:197-199): script/style bodies
    * dropped, tags removed, text nodes concatenated *without* separator,
    * entities decoded. Re-expressed as a chain of codegen'd regexp/replace
    * column ops — no jsoup offline, and a regex strip is the documented
    * baseline (SURVEY §2.1 S2).
    */
  def stripMarkup(html: Column): Column = {
    // No backreferences: keeps the pattern portable to RE2-based engines
    // (and to the DuckDB oracle).
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noScript =
      regexp_replace(noComments, "(?is)<script[^>]*>.*?</script\\s*>", "")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style\\s*>", "")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", "")
    // Entity decode after tag strip, &amp; last so "&amp;lt;" → "&lt;".
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    decoded
  }

  /** S2 over raw files: html/xml rows → (doc_id, text, source). */
  def htmlDocs(raw: DataFrame): DataFrame =
    raw
      .where(col("ext").isin("html", "htm", "xml"))
      .select(
        xxhash64(col("path")).as("doc_id"),
        stripMarkup(decode(col("content"), "UTF-8")).as("text"),
        col("path").as("source"))

  /** S4 over raw files: pdf rows → (doc_id, text, source) via the built-in
    * minimal extractor ([[PdfText]] — pure JVM, text-only PDFs; encrypted
    * input fails the task loudly). Extraction is the native
    * [[graft.functions.PdfExtract]] expression (also exposed to pure SQL
    * as `pdf_extract` via GraftExtensions), evaluated per row inside the
    * scan stage — fully distributed, no UDF boxing.
    */
  def pdfDocs(raw: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(raw.sparkSession)
    raw
      .where(col("ext") === "pdf")
      .select(
        xxhash64(col("path")).as("doc_id"),
        graft.functions.TextExpressions.pdfExtract(col("content")).as("text"),
        col("path").as("source"))
  }

  /** S4 fallback: pre-extracted text (the seam where a full-fidelity
    * external extractor slots in when [[PdfText]]'s text-only scope is not
    * enough, SURVEY §2.1 S4).
    */
  def textDocs(spark: SparkSession, parquetPath: String): DataFrame =
    spark.read.parquet(parquetPath)

  /** S5 per-row flatten: every column stringified and space-joined —
    * the relational-to-text step of `df.to_string(index=False)`
    * (app.py:204-205), kept per-row so it stays distributed.
    */
  def flattenRows(df: DataFrame, outCol: String = "line"): DataFrame = {
    val cols = df.columns.map(c => col(c).cast("string"))
    df.withColumn(outCol, concat_ws(" ", cols: _*))
  }

  /** S5 whole-table flatten: header + one line per row, newline-joined in
    * `orderCol` order. The single-string result mirrors the reference's
    * lossy text block; order is made explicit because Spark has none.
    * The sort-in-aggregate keeps this a single hash-agg (no global sort
    * shuffle) — fine for the bounded tables it is meant for.
    */
  def flattenTable(df: DataFrame, orderCol: String, outCol: String = "text"): DataFrame = {
    val header = df.columns.mkString(" ")
    flattenRows(df)
      .agg(collect_list(struct(col(orderCol).as("k"), col("line").as("v"))).as("rows"))
      .select(
        concat(
          lit(header + "\n"),
          array_join(transform(array_sort(col("rows")), _.getField("v")), "\n")
        ).as(outCol))
  }

  /** S6 over raw files: xlsx rows → (doc_id, text, source). NOTE the
    * reference accepts `.xlsx` and pins openpyxl but has NO processing
    * branch — uploads are silently dropped
    * (`/root/reference/micro-infobot/app.py:191` vs 194-205). This arm
    * therefore EXCEEDS the reference: [[XlsxText]] (pure JVM zip + StAX)
    * flattens each workbook's cell grid the way the csv arm flattens a
    * DataFrame (cells space-joined, rows/sheets newline-joined), via the
    * scan-stage [[graft.functions.XlsxExtract]] expression.
    */
  def xlsxDocs(raw: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(raw.sparkSession)
    raw
      .where(col("ext") === "xlsx")
      .select(
        xxhash64(col("path")).as("doc_id"),
        graft.functions.TextExpressions.xlsxExtract(col("content")).as("text"),
        col("path").as("source"))
  }

  /** S7: multi-source union (`text += ...` app.py:192-205, per-doc rows). */
  def unionCorpus(sources: DataFrame*): DataFrame =
    sources.reduce(_.unionByName(_, allowMissingColumns = true))

  /** S10/JSONL — the dominant LLM-dataset interchange format (one JSON
    * object per line; RedPajama/Dolma/FineWeb all ship it). The 100 TB
    * discipline, enforced rather than suggested:
    *
    *  - the schema is GIVEN, never inferred — inference is a full extra
    *    pass over the corpus before the first useful byte;
    *  - corrupt lines neither kill the job (FAILFAST) nor vanish
    *    (DROPMALFORMED): PERMISSIVE parsing lands them in a
    *    `_corrupt_record` audit column, so bad-line rates are a
    *    queryable signal (count them, alert on them) instead of silent
    *    data loss;
    *  - line-splittable text files keep per-line parallelism — JSONL's
    *    entire reason to exist over a JSON array.
    *
    * Returns the caller's schema plus `_corrupt_record` (null on good
    * rows, the raw line on bad ones — good fields are null there).
    *
    * Spark guard to know (QUERY_ONLY_CORRUPT_RECORD_COLUMN): a query
    * over the FILE arm whose referenced columns are ONLY the audit
    * column is refused by Spark itself — project at least one data
    * column alongside (`select($"_corrupt_record", $"doc_id")`), or
    * audit after a materialization. The column arm
    * ([[parseJsonlLines]]) has no such restriction.
    */
  def jsonlDocs(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "jsonlDocs adds the _corrupt_record audit column itself")
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** The column arm of [[jsonlDocs]]: parse a string column of JSONL
    * lines already in flight (a Kafka value, a WARC payload, a
    * synthesized fixture) under the same PERMISSIVE + audit contract.
    * Emits the schema's fields flattened plus `_corrupt_record`.
    */
  def parseJsonlLines(
      lines: DataFrame,
      lineCol: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "parseJsonlLines adds the _corrupt_record audit column itself")
    val full = schema.add("_corrupt_record", "string")
    lines
      .withColumn("__p", from_json(col(lineCol), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .select(full.fieldNames.map(f => col(s"__p.$f").as(f)): _*)
  }
}
