package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the imperative text operators, so SQL-only
  * deployments (`spark.sql.extensions=graft.GraftExtensions`) reach them
  * without a Scala UDF registration step: `SELECT pdf_extract(content)`,
  * `SELECT compression_ratio(text)`. Both are eval-based
  * ([[CodegenFallback]]): the per-row work is genuine byte-level
  * imperation (inflate, deflate, PDF scan) that gains nothing from
  * generated Java, and a fallback expression still pipelines inside the
  * scan stage.
  */
case class PdfExtract(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "pdf_extract"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.ingest.PdfText.extract(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): PdfExtract =
    copy(child = newChild)
}

/** Deflate compression ratio of a string — see
  * [[graft.ops.TextAnalytics.compressionRatio]] for the curation
  * semantics. Null and empty input are NEUTRAL (1.0), not null: curation
  * gates on "ratio too low" must not silently drop empty rows here.
  */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "compression_ratio"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 1.0
    else CompressionRatio.ratio(v.asInstanceOf[UTF8String].toString)
  }
  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object CompressionRatio {
  def ratio(text: String): Double = {
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (raw.isEmpty) 1.0
    else {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val k = d.deflate(buf)
        out.write(buf, 0, k)
      }
      d.end()
      math.rint(out.size.toDouble / raw.length * 1e6) / 1e6
    }
  }
}

/** XLSX → flattened text ([[graft.ingest.XlsxText.extract]] — the S6 arm
  * the reference accepts but never processes). Per-row unzip + StAX walk,
  * pipelined inside the scan stage like [[PdfExtract]].
  */
case class XlsxExtract(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "xlsx_extract"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.ingest.XlsxText.extract(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): XlsxExtract =
    copy(child = newChild)
}

/** ARRAY<ARRAY<STRING>> cell grid → a minimal real xlsx container
  * ([[graft.ingest.XlsxText.pack]]). Exists so tests and the s6 roundtrip
  * query can synthesize genuine workbooks distributively — the encode
  * twin of [[XlsxExtract]], same stance as the synthetic-image seam the
  * m-series uses.
  */
case class XlsxPack(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def prettyName: String = "xlsx_pack"
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ArrayType(StringType)))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any = {
    val grid = input.asInstanceOf[ArrayData]
    val rows = (0 until grid.numElements()).map { ri =>
      val r = grid.getArray(ri)
      (0 until r.numElements()).map { ci =>
        val v = r.getUTF8String(ci)
        if (v == null) "" else v.toString
      }
    }
    graft.ingest.XlsxText.pack(rows)
  }
  override protected def withNewChildInternal(newChild: Expression): XlsxPack =
    copy(child = newChild)
}

/** Count of ADJACENT in-order occurrences of `phrase` inside `tokens`
  * (both `ARRAY<STRING>`) — the verify half of
  * [[graft.search.Bm25.phraseMatches]], as a genuinely codegen'd loop.
  * The formulation it replaces — a nested
  * `size(filter(sequence(...), i => size(filter(sequence(...), j => ...))))`
  * HOF — ran in the EXPRESSION INTERPRETER at O(positions × phrase_len)
  * per candidate with a materialized index array per row, the exact class
  * this repo measured at 27× (SQ8 ADC) and 57× (hashed minhash); a phrase
  * of common terms makes the candidate set huge and every candidate paid
  * interpreter rates over its full token array. Here the generated code is
  * one static call per row into a tight JVM loop (the
  * [[VectorBinaryExpression]] static-forwarder pattern) — A/B'd with a
  * deliberately common anchor at the 2M-doc tier in ScaleSmoke/PERF.md.
  * An empty phrase counts 0 (callers refuse it upstream); overlapping
  * occurrences count individually, matching the HOF law.
  */
case class PhraseCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "phrase_count"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(toks: Any, phrase: Any): Any =
    PhraseCount.count(toks.asInstanceOf[ArrayData], phrase.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PhraseCount.count($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PhraseCount =
    copy(left = l, right = r)
}

object PhraseCount {
  /** Shared by the interpreted eval and the generated Java (static call —
    * no boxing, no per-element expression dispatch).
    */
  def count(toks: ArrayData, phrase: ArrayData): Long = {
    val n = toks.numElements()
    val m = phrase.numElements()
    if (m == 0 || m > n) return 0L
    var cnt = 0L
    var i = 0
    val limit = n - m
    while (i <= limit) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val x = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        val y = if (phrase.isNullAt(j)) null else phrase.getUTF8String(j)
        ok = x != null && y != null && x.equals(y)
        j += 1
      }
      if (ok) cnt += 1
      i += 1
    }
    cnt
  }
}

/** 64-bit SimHash of a token array (Charikar 2002 — the near-dup
  * signature under [[graft.ops.Dedup.simhash]]): per bit, the majority
  * vote of that bit over the tokens' xxhash64 values; ties and empty
  * input → 0. Token hash is Spark's OWN xxhash64 law
  * (`XxHash64Function`, seed 42; null token → the seed, exactly like
  * `xxhash64(NULL)`), so the result is bit-identical to the
  * `transform`/`aggregate` higher-order formulation it replaced — which
  * ran 64 interpreted `aggregate` passes per document in the expression
  * interpreter (HOFs do not participate in whole-stage codegen; the
  * class this repo measured at 27–57×). Here the whole signature is ONE
  * static call per row from generated Java: one pass over the tokens,
  * 64 integer vote counters, no per-element expression dispatch.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "simhash64"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(tokens: Any): Any =
    SimHash64.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by the interpreted eval and the generated Java. The bit vote
    * uses `(h >> b) & 1`, which equals the logical-shift formulation for
    * every b in [0, 64) — same law as the SQL `shiftright` the HOF
    * version used.
    */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (tokens.isNullAt(i)) 42L // xxhash64(NULL) returns the seed
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(tokens.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) r |= 1L << b
      b += 1
    }
    r
  }
}

object TextExpressions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("pdf_extract", es => PdfExtract(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "compression_ratio", es => CompressionRatio(es.head), "built-in")
    reg.createOrReplaceTempFunction("xlsx_extract", es => XlsxExtract(es.head), "built-in")
    reg.createOrReplaceTempFunction("xlsx_pack", es => XlsxPack(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "phrase_count", es => PhraseCount(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
  }

  def pdfExtract(c: Column): Column = call_function("pdf_extract", c)
  def compressionRatio(c: Column): Column = call_function("compression_ratio", c)
  def xlsxExtract(c: Column): Column = call_function("xlsx_extract", c)
  def xlsxPack(c: Column): Column = call_function("xlsx_pack", c)
  def phraseCount(tokens: Column, phrase: Column): Column =
    call_function("phrase_count", tokens, phrase)
}
