package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AviVideoSpec extends SparkSpec {
  import spark.implicits._

  private def frame(n: Int, len: Int): Array[Byte] =
    Array.tabulate(len)(i => ((n * 31 + i * 7) % 251).toByte)

  test("pack -> decode roundtrip: frames byte-exact, header carries dims/fps") {
    val fs = Seq(frame(1, 100), frame(2, 77), frame(3, 0)) // odd + empty lengths
    val bytes = AviVideo.pack(fs, width = 320, height = 240, fps = 25)
    val (w, h, fps, back) = AviVideo.decode(bytes)
    assert((w, h, fps) == ((320, 240, 25)))
    assert(back.size == 3)
    back.zip(fs).foreach { case (g, e) => assert(g.sameElements(e)) }
  }

  test("decode skips junk chunks and out-of-movi frame ids") {
    val base = AviVideo.pack(Seq(frame(4, 10)), 64, 64, 30)
    // append a JUNK chunk inside the RIFF body (word-aligned): decode
    // must skip it and still return the one frame
    val junk = Array[Byte]('J', 'U', 'N', 'K', 4, 0, 0, 0, 1, 2, 3, 4)
    val patched = java.nio.ByteBuffer
      .allocate(base.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(base).put(junk).array()
    // fix the RIFF size field to cover the appended chunk
    java.nio.ByteBuffer.wrap(patched).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, base.length - 8 + junk.length)
    val (_, _, _, back) = AviVideo.decode(patched)
    assert(back.size == 1 && back.head.sameElements(frame(4, 10)))
  }

  test("fps roundtrips exactly through strh rate/scale, even when 1e6 % fps != 0") {
    // avih's dwMicroSecPerFrame truncates 1e6/9999 to 100, which would
    // decode as 10000 — the strh (scale=1, rate=fps) pair carries the
    // exact value
    for (fps <- Seq(24, 9999, 300000, 1000000)) {
      val (_, _, got, _) = AviVideo.decode(AviVideo.pack(Seq(frame(1, 8)), 16, 16, fps))
      assert(got == fps, s"fps $fps decoded as $got")
    }
  }

  test("videoFrameHashes refuses composite-key bound violations loudly") {
    val bad = Seq((-1L, AviVideo.pack(Seq(frame(1, 8)), 16, 16, 24)))
      .toDF("media_id", "bytes").withColumn("kind", lit("video"))
    val e = intercept[Exception] {
      Multimodal.videoFrameHashes(bad).collect()
    }
    assert(e.getMessage.contains("composite-key bounds") ||
      e.getCause != null && e.getCause.getMessage.contains("composite-key bounds"),
      s"expected the bounds refusal, got: ${e.getMessage}")
  }

  test("decode refuses non-AVI, overruns, and headerless containers loudly") {
    intercept[IllegalArgumentException] {
      AviVideo.decode("not an avi at all".getBytes)
    }
    intercept[IllegalArgumentException] { // a WAV is RIFF but not AVI
      AviVideo.decode(WavAudio.pack(Seq(1, 2, 3)))
    }
    val good = AviVideo.pack(Seq(frame(1, 40)), 64, 64, 30)
    intercept[IllegalArgumentException] { // truncated: chunk overruns
      AviVideo.decode(good.take(good.length - 10))
    }
  }

  test("avi_pack/avi_frames expressions: scan-stage roundtrip + SQL surface") {
    graft.functions.VideoExpressions.register(spark)
    val out = spark.range(3).select(
      col("id"),
      graft.functions.VideoExpressions.aviFrames(
        graft.functions.VideoExpressions.aviPack(
          array(col("id").cast("string").cast("binary"),
            concat(col("id").cast("string"), lit("-f2")).cast("binary")),
          lit(64), lit(64), lit(24))).as("frames"))
      .select(col("id"), posexplode(col("frames")).as(Seq("i", "f")))
      .select(col("id"), col("i"), col("f").cast("string").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(out == (0L until 3L).flatMap(i =>
      Seq((i, 0, i.toString), (i, 1, s"$i-f2"))).toSet)
    val viaSql = spark.sql(
      "SELECT size(avi_frames(avi_pack(array(CAST('x' AS BINARY)), 8, 8, 10)))")
      .head.getInt(0)
    assert(viaSql == 1)
  }

  test("videoFrames + videoNearDupPairs: shot-aligned dedup over real PNG frames") {
    // 12 videos, 4 frames each: scene sequence = vid % 4, brightness
    // variant = vid / 4 (0/10/20) — videos sharing a scene sequence are
    // near-dups across ALL frames; different scenes share none
    val vids = spark.range(12).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        val frames = (0 until 4).map(f =>
          SyntheticImages.png(seed = (id % 4).toInt * 16 + f,
            brighten = (id / 4).toInt * 10))
        (id, AviVideo.pack(frames, 64, 64, 24))
      }).toDF("media_id", "bytes").withColumn("kind", lit("video"))

    val frames = Multimodal.videoFrames(vids)
    assert(frames.count() == 48)
    assert(frames.groupBy("media_id").count().select("count")
      .as[Long].collect().forall(_ == 4))

    val pairs = Multimodal.videoNearDupPairs(vids,
      minMatching = 3, maxHamming = 6, decoder = ImageIoDecoder)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      a <- 0L until 12L; b <- 0L until 12L
      if a < b && a % 4 == b % 4
    } yield (a, b)).toSet
    assert(pairs == want,
      s"extra ${pairs.diff(want).take(5)}, missing ${want.diff(pairs).take(5)}")
  }
}
