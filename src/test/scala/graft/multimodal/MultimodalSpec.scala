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
}
