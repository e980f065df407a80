package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder brief): image/audio/video as opaque
  * `BINARY` columns with typed metadata, batch-shaped decode / feature /
  * frame-sample operators.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container): [[FakeDecoder]] is a deterministic stand-in with the real
  * Spark-side contract — schema, batched `mapPartitions` execution (the
  * Scala analog of `mapInPandas`: per-partition iterator processed in
  * fixed-size batches, so a real vectorized decoder drops in without plan
  * changes), and per-kind dispatch. Partitioning guidance: media tables
  * should be written bucketed/partitioned by `kind` so per-kind decode
  * stages prune at the scan.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap a text table as fake media rows (fixtures ship no binary media;
    * text bytes stand in — the plumbing is identical).
    */
  def fromDocuments(docs: DataFrame, kind: String = "image"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit(kind).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        length(col("text")).as("width"),
        lit(1).as("height"),
        (length(col("text")).cast("long") * 10L).as("duration_ms"),
        lit("fake").as("codec")
      ).as("meta"))

  /** Batch decode → fixed-size feature vector. Runs as `mapPartitions`
    * over `batchSize`-row groups (the Arrow-batch shape). The feature
    * function is the stub; everything around it is production plumbing.
    */
  def decodeFeatures(media: DataFrame, dims: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "bytes").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // A real decoder would hand `batch` to a vectorized library here.
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            FakeDecoder.features(bytes, dims))
        }
      }
    }(enc)
  }

  /** Frame sampling for video: n evenly spaced offsets into the payload,
    * one row per sampled frame — pure column algebra, no UDF.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame =
    media
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
      .where(col("n_bytes") > 0)
      .select(
        col("media_id"),
        posexplode(transform(sequence(lit(0), lit(nFrames - 1)),
          i => floor(i.cast("long") * col("n_bytes") / nFrames).cast("long")))
          .as(Seq("frame_idx", "byte_offset")))
      .withColumn("frame_idx", col("frame_idx").cast("long"))

  /** "Resize": metadata-only transform rewriting the target dims — stands
    * in for an image resize whose Spark-side contract is a projection.
    */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.duration_ms").as("duration_ms"), col("meta.codec").as("codec")))

  // ------------------------------------------------ perceptual-hash dedup

  /** Difference-hash (dHash) over the decoded feature vector: bit i is the
    * sign of the gradient `features[i+1] > features[i]` — the standard
    * perceptual image fingerprint, which survives brightness/scale shifts
    * that break exact byte hashes. With `dims` = 64 features this packs 63
    * comparisons into a positive 64-bit signature (bit 63 stays clear:
    * both engines then agree without signed-shift edge cases).
    *
    * The feature source is [[decodeFeatures]] — a real image decoder drops
    * into that seam and this column does not change; the bit-pack itself
    * is pure codegen algebra over the feature array.
    */
  def dHash(media: DataFrame, dims: Int = 64): DataFrame = {
    require(dims >= 2 && dims <= 64, s"dHash: dims $dims outside [2, 64]")
    decodeFeatures(media, dims)
      .withColumn("phash",
        aggregate(
          transform(sequence(lit(0), lit(dims - 2)),
            i => when(
              call_function("element_at", col("features"), i + lit(2)) >
                call_function("element_at", col("features"), i + lit(1)),
              call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
          lit(0L), (acc, b) => acc.bitwiseOR(b)))
      .drop("features")
  }

  /** Near-duplicate media pairs: [[dHash]] signatures within `maxHamming`
    * bits, found with the shared band join ([[graft.ops.Dedup.hammingPairs]]
    * — bucketed, hot-bucket-guarded, never all-pairs). The image analog of
    * document SimHash dedup, sharing its machinery and its guarantees.
    */
  def phashPairs(
      media: DataFrame,
      maxHamming: Int = 3,
      dims: Int = 64,
      maxBucketSize: Long = 1L << 20): DataFrame =
    graft.ops.Dedup.hammingPairs(
      dHash(media, dims).where(col("phash").isNotNull),
      "media_id", "phash", maxHamming, maxBucketSize)
}

/** Deterministic decode stub — replace with a real codec binding. */
object FakeDecoder {
  /** Feature i = mean of byte values congruent to i mod dims, scaled. */
  def features(bytes: Array[Byte], dims: Int): Array[Float] = {
    if (bytes == null) return null
    val sums = new Array[Long](dims)
    val counts = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) {
      val d = i % dims
      sums(d) += bytes(i) & 0xFF
      counts(d) += 1
      i += 1
    }
    Array.tabulate(dims)(d =>
      if (counts(d) == 0) 0.0f else (sums(d).toDouble / counts(d) / 255.0).toFloat)
  }
}
