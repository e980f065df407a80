package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "abcdefgh" * 8),  // 64 bytes
    (2L, "xy"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("fromDocuments produces the media schema with typed metadata") {
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "bytes", "meta"))
    val meta = media.where($"media_id" === 1)
      .select("meta.width", "meta.duration_ms").as[(Int, Long)].head()
    assert(meta == ((64, 640L)))
  }

  test("decodeFeatures runs batched and is deterministic") {
    val media = Multimodal.fromDocuments(docs)
    val f1 = Multimodal.decodeFeatures(media, dims = 8, batchSize = 2)
      .orderBy("media_id").select("features").as[Array[Float]].collect()
    val f2 = Multimodal.decodeFeatures(media.repartition(3), dims = 8, batchSize = 64)
      .orderBy("media_id").select("features").as[Array[Float]].collect()
    assert(f1.length == 3)
    assert(f1.zip(f2).forall { case (a, b) => a.toSeq == b.toSeq })
    assert(f1.head.length == 8)
    // features are normalized byte means
    assert(f1.head.forall(v => v >= 0f && v <= 1f))
  }

  test("decodeFeatures matches the stub computed directly") {
    val bytes = ("abcdefgh" * 8).getBytes("UTF-8")
    val expected = FakeDecoder.features(bytes, 8).toSeq
    val got = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs), dims = 8)
      .where($"media_id" === 1).select("features").as[Array[Float]].head().toSeq
    assert(got == expected)
  }

  test("sampleFrames emits evenly spaced offsets, skips empty payloads") {
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), nFrames = 4)
    val byDoc = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(byDoc == Map(1L -> 4L, 2L -> 4L)) // doc 3 empty -> excluded
    val offs = frames.where($"media_id" === 1).orderBy("frame_idx")
      .select("byte_offset").as[Long].collect().toSeq
    assert(offs == Seq(0L, 16L, 32L, 48L))
  }

  test("resizeMeta rewrites dimensions, preserves duration") {
    val resized = Multimodal.resizeMeta(Multimodal.fromDocuments(docs), 128, 128)
    val m = resized.where($"media_id" === 1)
      .select("meta.width", "meta.height", "meta.duration_ms")
      .as[(Int, Int, Long)].head()
    assert(m == ((128, 128, 640L)))
  }

  test("dHash packs gradient signs; matches a driver-side recomputation") {
    val got = Multimodal.dHash(Multimodal.fromDocuments(docs), dims = 8)
      .orderBy("media_id").select("phash").as[Long].collect().toSeq
    val expected = docs.orderBy("doc_id").select("text").as[String].collect().map { t =>
      val f = FakeDecoder.features(t.getBytes("UTF-8"), 8)
      (0 until 7).map(i => if (f(i + 1) > f(i)) 1L << i else 0L).reduce(_ | _)
    }.toSeq
    assert(got == expected, s"got $got expected $expected")
    // top bit never set (dims-1 comparisons), so the hash is non-negative
    assert(got.forall(_ >= 0L))
  }

  test("phashPairs equals brute force on a corpus with a planted near-dup") {
    // doc 11 is doc 1 with one byte changed -> tiny gradient flip count;
    // doc 4 is unrelated noise
    val corpus = Seq(
      (1L, "abcdefgh" * 8),
      (11L, "abcdefgh" * 7 + "abcdefgz"),
      (4L, "zqwkrtpv" * 8 + "mn")
    ).toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(corpus)
    val sigs = Multimodal.dHash(media).select("media_id", "phash")
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 15
    } yield (a, b, h.toLong)).toSet
    val got = Multimodal.phashPairs(media, maxHamming = 15)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, s"banded join must be lossless: got $got brute $brute")
    assert(got.exists { case (a, b, _) => a == 1L && b == 11L },
      "planted near-dup must be found")
  }

  // ------------------------- real decode path (javax.imageio, no stub)

  /** Deterministic w×h RGB test image: per-8×8-block seeded luminance (so
    * the structure SURVIVES cell pooling — different seeds give different
    * cell-scale scenes, unlike pixel noise which averages out) plus a mild
    * per-pixel perturbation. Reproducible across runs.
    */
  private def testImage(w: Int, h: Int, seed: Int,
      brighten: Int = 0): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    def blockLum(bx: Int, by: Int): Int =
      new scala.util.Random(seed * 1000003 + by * 97 + bx).nextInt(220)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until h; x <- 0 until w) {
      val base = blockLum(x / 8, y / 8) + rnd.nextInt(8) + brighten
      val v = math.min(255, math.max(0, base))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def scale2x(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      img.getWidth * 2, img.getHeight * 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, out.getWidth, out.getHeight, null)
    g.dispose()
    out
  }

  private def hashOf(bytes: Array[Byte]): Long = {
    val f = ImageIoDecoder.features(bytes, 64)
    assert(f != null && f.length == 64)
    (0 until 63).map(i => if (f(i + 1) > f(i)) 1L << i else 0L).foldLeft(0L)(_ | _)
  }

  test("ImageIoDecoder: real PNG decode, dHash stable across format/scale/brightness") {
    val img = testImage(64, 64, seed = 7)
    val png = hashOf(encode(img, "png"))
    // codec-invariance: the same pixels through a different LOSSLESS codec
    assert(hashOf(encode(img, "bmp")) == png, "png and bmp must hash identically")
    // resize stability: 2x upscale pools back into the same cells
    val scaled = hashOf(encode(scale2x(img), "png"))
    assert(java.lang.Long.bitCount(scaled ^ png) <= 3,
      s"2x upscale must be near-invariant, hamming=${java.lang.Long.bitCount(scaled ^ png)}")
    // brightness shift preserves gradient SIGNS (the dHash invariance)
    val bright = hashOf(encode(testImage(64, 64, seed = 7, brighten = 20), "png"))
    assert(java.lang.Long.bitCount(bright ^ png) <= 3,
      s"brightness shift must be near-invariant, hamming=${java.lang.Long.bitCount(bright ^ png)}")
    // a different image is a different hash
    val other = hashOf(encode(testImage(64, 64, seed = 999), "png"))
    assert(java.lang.Long.bitCount(other ^ png) > 8, "distinct images must differ")
    // undecodable payloads yield null, never throw
    assert(ImageIoDecoder.features("not an image".getBytes, 64) == null)
    assert(ImageIoDecoder.features(null, 64) == null)
    assert(ImageIoDecoder.features(Array.empty[Byte], 64) == null)
  }

  test("phashPairs over REAL images finds the near-dup through the imageio decoder") {
    // three real PNGs: 1 and 11 are the same scene at different scales
    // (+ mild brightness), 4 is a different scene
    val rows = Seq(
      (1L, encode(testImage(64, 64, seed = 7), "png")),
      (11L, encode(scale2x(testImage(64, 64, seed = 7, brighten = 10)), "png")),
      (4L, encode(testImage(64, 64, seed = 999), "png")))
    val media = rows.toDF("media_id", "bytes")
      .withColumn("kind", lit("image"))
    val pairs = Multimodal.phashPairs(media, maxHamming = 6,
      decoder = ImageIoDecoder)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 11L)), s"got $pairs")
  }
}
