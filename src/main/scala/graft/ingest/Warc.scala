package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

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
  * member boundaries; the strict multi-member reader below concatenates
  * members with exact byte accounting (the JDK's GZIPInputStream would
  * silently swallow a corrupt member as EOF), and because records are
  * length-prefixed the decompressed stream parses sequentially.
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
        // NOT java.util.zip.GZIPInputStream: it silently treats a corrupt
        // member HEADER mid-archive as EOF (it probes the next member's
        // magic and, on mismatch, reports end-of-stream), so a damaged
        // multi-member .warc.gz would parse to a clean record PREFIX with
        // no error — at odds with the refuse-loudly stance (ADVICE r12;
        // the truncation property only covers byte-truncation). The
        // strict reader walks members with exact byte accounting and
        // verifies each trailer, so damage anywhere in the archive is an
        // exception, never a prefix.
        new StrictMultiMemberGzip(bytes)
      else new ByteArrayInputStream(bytes)
    val in = new java.io.BufferedInputStream(raw, 65536)
    try parseStream(in)
    finally in.close() // releases the gzip Inflater's native window now
  }

  /** Streaming multi-member gzip reader with NO silent-EOF path (RFC
    * 1952): every member's header is validated (magic, CM = deflate,
    * reserved flag bits), FEXTRA/FNAME/FCOMMENT/FHCRC fields are walked
    * per the spec, the deflate body inflates with exact input
    * accounting, and the 8-byte trailer's CRC32 + ISIZE are verified
    * against the decompressed bytes. Bytes after a member's trailer must
    * begin the next member — anything else (corrupt magic, truncated
    * body, garbage tail) throws. Memory stays O(buffer): the compressed
    * blob is the caller's array; decompression is pull-driven.
    */
  private final class StrictMultiMemberGzip(bytes: Array[Byte]) extends InputStream {
    private val inf = new java.util.zip.Inflater(true) // nowrap: raw deflate
    private val crc = new java.util.zip.CRC32
    private var pos = 0 // next unconsumed offset in `bytes`
    private var dataStart = 0 // where the current member's deflate body began
    private var memberOut = 0L // decompressed bytes of the current member
    private var inMember = false
    private var closed = false

    private def u8(i: Int): Int = {
      require(i < bytes.length,
        s"truncated gzip archive: expected a byte at offset $i, input ends at ${bytes.length}")
      bytes(i) & 0xff
    }
    private def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    private def u32le(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL

    /** Parse one member header at `pos`; positions the inflater at the
      * deflate body. False at a clean end-of-archive.
      */
    private def startMember(): Boolean = {
      if (pos == bytes.length) return false
      require(u8(pos) == 0x1f && u8(pos + 1) == 0x8b,
        f"corrupt gzip member at offset $pos: bad magic 0x${u8(pos)}%02x${u8(pos + 1)}%02x")
      require(u8(pos + 2) == 8,
        s"gzip member at offset $pos: unsupported compression method ${u8(pos + 2)}")
      val flg = u8(pos + 3)
      require((flg & 0xe0) == 0,
        s"gzip member at offset $pos: reserved FLG bits set ($flg)")
      var p = pos + 10 // magic(2) CM(1) FLG(1) MTIME(4) XFL(1) OS(1)
      if ((flg & 4) != 0) p += 2 + u16le(p) // FEXTRA: XLEN + payload
      if ((flg & 8) != 0) { while (u8(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (u8(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) { // FHCRC: CRC32 of the header bytes, low 16
        val stored = u16le(p) // u16le probes p and p+1, bounds-checked
        val hc = new java.util.zip.CRC32
        hc.update(bytes, pos, p - pos)
        val computed = (hc.getValue & 0xffffL).toInt
        require(computed == stored,
          f"gzip member at offset $pos: header CRC16 mismatch " +
            f"(stored 0x$stored%04x, computed 0x$computed%04x)")
        p += 2
      }
      require(p <= bytes.length,
        s"truncated gzip member header at offset $pos")
      inf.reset()
      inf.setInput(bytes, p, bytes.length - p)
      crc.reset()
      dataStart = p
      memberOut = 0L
      inMember = true
      true
    }

    /** Member body finished: account exactly how much input the deflate
      * stream consumed, verify the trailer, and position at the next
      * member (or archive end).
      */
    private def finishMember(): Unit = {
      pos = dataStart + ((bytes.length - dataStart) - inf.getRemaining)
      val storedCrc = u32le(pos)
      val storedIsize = u32le(pos + 4)
      require(storedCrc == crc.getValue,
        f"gzip member CRC mismatch at offset $pos: stored 0x$storedCrc%08x, computed 0x${crc.getValue}%08x")
      require(storedIsize == (memberOut & 0xffffffffL),
        s"gzip member ISIZE mismatch at offset $pos: stored $storedIsize, decompressed $memberOut")
      pos += 8
      inMember = false
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (closed) throw new java.io.IOException("stream closed")
      if (len == 0) return 0
      if (!inMember && !startMember()) return -1
      def inflate(): Int =
        try inf.inflate(b, off, len)
        catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"corrupt deflate data in gzip member starting at offset $dataStart: ${e.getMessage}")
        }
      var n = inflate()
      while (n == 0) {
        if (inf.finished()) {
          finishMember()
          if (!startMember()) return -1
          n = inflate()
        } else if (inf.needsInput() || inf.needsDictionary())
          throw new IllegalArgumentException(
            s"truncated gzip member: deflate stream ended at input offset ${bytes.length}")
        else n = inflate()
      }
      crc.update(b, off, n)
      memberOut += n
      n
    }

    override def close(): Unit = {
      if (!closed) { closed = true; inf.end() }
    }
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
          // Locale.ROOT: the default locale's toLowerCase is not a header
          // fold — under tr-TR, 'Content-Length' lowercases to a
          // dotless-ı form that never matches the lookup keys, so every
          // record would be rejected as missing Content-Length (ADVICE r12)
          headers.put(
            hl.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT),
            hl.substring(i + 1).trim)
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
