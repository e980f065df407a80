package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingest — the container web-scale text
  * corpora actually ship in (Common Crawl publishes ~100k `.warc.gz`
  * files of ~1 GiB per monthly crawl). The reference ingests five office
  * formats through one uploader (`/root/reference/micro-infobot/
  * app.py:191`); a 100 TB training-data pipeline's equivalent front door
  * is this record stream.
  *
  * Format essentials (ISO 28500 §4): a record is a `WARC/1.0` version
  * line, CRLF-terminated named headers, an empty line, exactly
  * `Content-Length` payload bytes, then a blank-line pair separating it
  * from the next record; records concatenate into a file. Common Crawl
  * gzips each record as its OWN gzip member so readers can split at
  * member boundaries; `java.util.zip.GZIPInputStream` transparently
  * concatenates members, and because records are length-prefixed the
  * decompressed stream parses sequentially without member bookkeeping.
  *
  * Scale shape: one WARC file is inherently sequential (gzip members +
  * length-prefixed records), so the parallel unit is the FILE —
  * `binaryFile` rows fan records out via `flatMap`, giving a crawl's
  * natural ~1 GiB × 100k-file layout one task per file with zero
  * shuffle; per-task memory is one blob + one record. Malformed bytes
  * refuse loudly (the house stance): a truncated payload, a missing
  * `Content-Length`, or a non-header line is a corrupt archive, never a
  * silently-dropped record.
  */
object Warc {

  /** One parsed record. `payload` is the raw block (binary-safe: HTML,
    * images, DNS text — WARC carries anything).
    */
  case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: String,
      contentType: String,
      payload: Array[Byte])

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Serialize records as a WARC/1.0 blob. `gzipPerRecord = true` writes
    * one gzip member per record (the Common Crawl convention — readers
    * that DO track member offsets can split mid-file; ours reads the
    * concatenation, which is always valid). Java's gzip header is
    * timestamp-zero, so output bytes are deterministic.
    */
  def writeRecords(
      records: Iterator[WarcRecord],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val one = new ByteArrayOutputStream()
      one.write(s"WARC/1.0\r\n".getBytes(StandardCharsets.US_ASCII))
      def h(k: String, v: String): Unit = {
        require(!v.contains('\r') && !v.contains('\n'),
          s"WARC header $k value must be single-line")
        one.write(s"$k: $v\r\n".getBytes(StandardCharsets.UTF_8))
      }
      h("WARC-Type", r.warcType)
      h("WARC-Record-ID", r.recordId)
      if (r.targetUri.nonEmpty) h("WARC-Target-URI", r.targetUri)
      if (r.contentType.nonEmpty) h("Content-Type", r.contentType)
      h("Content-Length", r.payload.length.toString)
      one.write(Crlf)
      one.write(r.payload)
      one.write(Crlf); one.write(Crlf)
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        gz.write(one.toByteArray)
        // close(), not just finish(): releases the native Deflater NOW.
        // finish()-only leaked one deflater's native window per RECORD
        // until GC — measured as an OS OOM kill (exit 137) at 2M
        // records despite an idle 48 GiB heap. Closing is safe: the
        // underlying ByteArrayOutputStream's close is a no-op.
        gz.close()
      } else out.write(one.toByteArray)
    }
    out.toByteArray
  }

  /** Parse a WARC blob — plain or gzipped (multi-member transparently
    * concatenated). Returns records in file order; refuses malformed
    * input loudly.
    */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes.isEmpty) return Nil
    val raw: InputStream =
      if (bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new GZIPInputStream(new ByteArrayInputStream(bytes), 65536)
      else new ByteArrayInputStream(bytes)
    val in = new java.io.BufferedInputStream(raw, 65536)
    try parseStream(in)
    finally in.close() // releases the gzip Inflater's native window now
  }

  private def parseStream(in: InputStream): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var line = readLine(in)
    while (line != null) {
      // skip the inter-record blank pair / stray blank lines
      if (line.isEmpty) line = readLine(in)
      else {
        require(line.startsWith("WARC/"),
          s"expected a WARC version line, got '${line.take(40)}'")
        val headers = scala.collection.mutable.Map.empty[String, String]
        var hl = readLine(in)
        while (hl != null && hl.nonEmpty) {
          val i = hl.indexOf(':')
          require(i > 0, s"malformed WARC header line '${hl.take(40)}'" +
            " (folded/continued headers are not supported)")
          headers.put(hl.substring(0, i).trim.toLowerCase, hl.substring(i + 1).trim)
          hl = readLine(in)
        }
        require(hl != null, "truncated WARC record: EOF inside the header block")
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            "WARC record is missing Content-Length")).toLong
        require(len <= Int.MaxValue - 8, s"WARC payload of $len bytes " +
          "exceeds the single-record limit; split the source file")
        val payload = in.readNBytes(len.toInt)
        require(payload.length == len,
          s"truncated WARC payload: expected $len bytes, got ${payload.length}")
        out += WarcRecord(
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-record-id", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("content-type", ""),
          payload)
        line = readLine(in)
      }
    }
    out.result()
  }

  /** CRLF-terminated header line decoded as UTF-8 (ISO 28500 allows
    * UTF-8 in header values — a crawl's target URIs are not ASCII; an
    * ASCII decode would mangle them silently); null at EOF. A bare LF
    * terminator is tolerated (lenient like HTTP parsers, the payload
    * itself is untouched either way).
    */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      buf.write(b)
      b = in.read()
    }
    if (b < 0 && buf.size() == 0) return null
    val a = buf.toByteArray
    val n = if (a.nonEmpty && a(a.length - 1) == '\r') a.length - 1 else a.length
    new String(a, 0, n, StandardCharsets.UTF_8)
  }

  /** Columnar record schema shared by the two read arms. */
  private val RecordCols = Seq(
    "warc_type", "record_id", "target_uri", "content_type", "payload")

  /** Parse a binary column of WARC blobs into one row per record,
    * carrying the caller's other columns through (the blob's provenance —
    * file path, shard id). One narrow `flatMap` stage: no shuffle, per-task
    * memory is one blob.
    */
  def parseBlobs(df: DataFrame, blobCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keep = df.columns.filter(_ != blobCol).toSeq
    val pairs = df
      .select(to_json(struct(keep.map(col): _*)).as("__ctx"), col(blobCol).as("__blob"))
      .as[(String, Array[Byte])]
      .flatMap { case (ctx, blob) =>
        parseAll(blob).map(r =>
          (ctx, r.warcType, r.recordId, r.targetUri, r.contentType, r.payload))
      }
      .toDF("__ctx" +: RecordCols: _*)
    val ctxStruct = from_json(col("__ctx"),
      df.select(keep.map(col): _*).schema).as("__c")
    pairs
      .select(ctxStruct +: RecordCols.map(col): _*)
      .select(keep.map(k => col(s"__c.$k").as(k)) ++ RecordCols.map(col): _*)
  }

  /** The write arm — serialize a corpus into WARC blobs, one
    * `(group, content)` row per `groupCol` value: each group's rows sort
    * by `uriCol` and write as one gzip-per-record `response` blob (the
    * Common Crawl layout; a group is a shard/file's worth of records, so
    * the blob is task-local and the stage is one keyed shuffle). The
    * group key returns as a string. Inverse of [[parseBlobs]]: used to
    * build archives, and to roundtrip the parser against a SQL oracle
    * (`s9_warc_ingest`).
    */
  def toWarcBlobs(
      df: DataFrame,
      groupCol: String,
      uriCol: String,
      recordIdCol: String,
      payloadCol: String,
      contentType: String = "text/plain; charset=utf-8",
      gzipPerRecord: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(uriCol), col(recordIdCol),
        col(payloadCol))
      .as[(String, String, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val rows = it.toArray.sortBy(_._2)
        (g, writeRecords(rows.iterator.map { case (_, uri, rid, payload) =>
          WarcRecord("response", rid, uri, contentType, payload)
        }, gzipPerRecord))
      }
      .toDF(groupCol, "content")
  }

  /** Read `.warc` / `.warc.gz` files into records: `binaryFile` (one task
    * per file — the crawl's natural parallel unit, gzip being
    * non-splittable anyway) → [[parseBlobs]]. `pathGlobFilter` narrows the
    * listing; provenance is the file `path` column.
    */
  def readWarc(
      spark: SparkSession,
      path: String,
      pathGlobFilter: String = "*.warc*"): DataFrame =
    parseBlobs(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", pathGlobFilter)
        .load(path)
        .select(col("path"), col("content")),
      "content")

  /** Streaming twin of [[readWarc]]: a crawl LANDING DIRECTORY consumed
    * continuously — each new `.warc(.gz)` file becomes one micro-batch
    * unit (the file-source checkpoint log tracks seen files, so a
    * restart never re-ingests; `maxFilesPerTrigger` bounds a batch when
    * the crawler dumps thousands of files at once). The parse is the
    * SAME [[parseBlobs]] the batch arm runs — stateless, so the sink
    * needs no ledger: parquet-append exactly-once comes from the sink
    * checkpoint alone.
    */
  def readWarcStream(
      spark: SparkSession,
      dir: String,
      pathGlobFilter: String = "*.warc*",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // streaming file sources refuse to infer — binaryFile's schema is
    // FIXED by the format, so supply it verbatim
    val binaryFileSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
    val reader = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", pathGlobFilter)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    parseBlobs(
      reader.load(dir).select(col("path"), col("content")),
      "content")
  }

  /** Land a streaming record frame (from [[readWarcStream]], typically
    * through [[responseText]]) as an append-only parquet corpus.
    */
  def corpusSink(
      records: DataFrame,
      outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)

  /** The text arm: keep `response` records and decode the payload as
    * UTF-8 with invalid sequences → U+FFFD, deterministically — a crawl
    * ALWAYS carries some, and `decode(payload, 'UTF-8')` THROWS on them
    * (MALFORMED_CHARACTER_CODING, measured), which would kill a 100 TB
    * job on its first mojibake page. The raw cast wraps the bytes
    * unvalidated; `make_valid_utf8` repairs in place (both codegen).
    * The filter runs BEFORE decode, so non-text record types (request,
    * metadata, conversion) never pay it.
    */
  def responseText(records: DataFrame): DataFrame =
    records
      .where(col("warc_type") === "response")
      .withColumn("text", call_function("make_valid_utf8",
        col("payload").cast("string")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .drop("payload")
}
