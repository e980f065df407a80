package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WAV codec + frame-RMS: roundtrip exactness, RIFF chunk-walk tolerance,
  * loud refusals, feature math, and the Spark expression surface.
  */
class WavAudioSpec extends SparkSpec {

  test("pack -> decode roundtrip is sample-exact; header carries the rate") {
    val samples = Seq(0, 1, -1, 32767, -32768, 1000, -999)
    val (rate, got) = WavAudio.decode(WavAudio.pack(samples, 8000))
    assert(rate == 8000)
    assert(got.toSeq == samples.map(_.toShort))
  }

  test("pack clamps out-of-range samples to 16-bit") {
    val (_, got) = WavAudio.decode(WavAudio.pack(Seq(40000, -40000)))
    assert(got.toSeq == Seq(Short.MaxValue, Short.MinValue))
  }

  test("decode walks extra chunks (LIST before data, odd-length padding)") {
    val base = WavAudio.pack(Seq(5, 6, 7), 16000)
    // splice a 3-byte LIST chunk (odd length => 1 pad byte) before data
    val dataPos = {
      // find "data" marker
      (0 until base.length - 4).find(i =>
        new String(base, i, 4, "US-ASCII") == "data").get
    }
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(dataPos) ++ extra ++ base.drop(dataPos)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (_, got) = WavAudio.decode(spliced)
    assert(got.toSeq == Seq[Short](5, 6, 7))
  }

  test("decode refuses non-WAV, compressed, stereo, and overrunning chunks loudly") {
    intercept[IllegalArgumentException] { WavAudio.decode("MP3junk".getBytes) }
    val pcm = WavAudio.pack(Seq(1, 2))
    val compressed = pcm.clone(); compressed(20) = 2 // format tag -> ADPCM
    intercept[IllegalArgumentException] { WavAudio.decode(compressed) }
    val stereo = pcm.clone(); stereo(22) = 2
    intercept[IllegalArgumentException] { WavAudio.decode(stereo) }
    val overrun = pcm.clone()
    java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 1 << 20) // data length past the container
    intercept[IllegalArgumentException] { WavAudio.decode(overrun) }
  }

  test("frameRms: hand-checked energy, partial trailing frame dropped") {
    val samples = Array[Short](3, 4, 0, 0, 7) // frames of 2: (3,4), (0,0); 7 dropped
    val rms = WavAudio.frameRms(samples, 2)
    assert(rms.length == 2)
    assert(math.abs(rms(0) - math.sqrt(12.5)) < 1e-12)
    assert(rms(1) == 0.0)
  }

  test("expressions: wav_pack/wav_rms inside the scan stage + SQL surface") {
    import spark.implicits._
    graft.functions.AudioExpressions.register(spark)
    val df = Seq((1L, Seq(3, 4, 0, 0)), (2L, Seq(0, 0, 0, 0)))
      .toDF("id", "samples")
      .withColumn("wav", graft.functions.AudioExpressions.wavPack(
        col("samples"), lit(16000)))
    val out = df.select(col("id"),
      graft.functions.AudioExpressions.wavRms(col("wav"), lit(2)).as("rms"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Double](1).head == math.sqrt(12.5))
    assert(out(1).getSeq[Double](1) == Seq(0.0, 0.0))
    df.createOrReplaceTempView("wavs")
    assert(spark.sql("SELECT size(wav_rms(wav, 2)) FROM wavs WHERE id = 1")
      .head.getInt(0) == 2)
  }
}
