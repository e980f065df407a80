package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Audio arm of the multimodal seam (SURVEY's "audio as opaque binary
  * columns with typed metadata"): a REAL container codec for PCM16 mono
  * WAV — RIFF/fmt/data chunk walk on decode, canonical 44-byte-header
  * writer on encode — so the m6 pipeline exercises genuine byte-level
  * decode exactly like m5's `javax.imageio` arm, not a stub. Compressed
  * formats stay behind the documented external-decoder seam
  * ([[MediaDecoder]]); non-WAV / non-PCM16 input fails the row loudly
  * (the [[graft.ingest.PdfText]] stance).
  *
  * Feature extraction is per-frame RMS energy — the first feature every
  * audio curation pipeline computes (silence trimming, VAD gating,
  * loudness normalization). Integer samples + IEEE sqrt make it exactly
  * reproducible by the SQL oracle.
  */
object WavAudio {

  /** PCM16 mono little-endian WAV from integer samples (clamped to
    * 16-bit). The encode twin of [[decode]], same stance as
    * `xlsx_pack`/`SyntheticImages.png`: tests and queries synthesize real
    * containers distributively.
    */
  def pack(samples: Seq[Int], sampleRate: Int = 16000): Array[Byte] = {
    require(sampleRate > 0, s"wav pack: sampleRate must be positive, got $sampleRate")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s =>
      buf.putShort(math.max(Short.MinValue, math.min(Short.MaxValue, s)).toShort))
    buf.array()
  }

  /** Parse a PCM16 mono WAV: returns (sampleRate, samples). Walks the
    * RIFF chunk list (extra chunks like LIST/fact are skipped), so
    * writer-padded files decode too. Refuses loudly: not-RIFF, missing
    * fmt/data, compressed (format tag ≠ 1), non-16-bit, or multi-channel.
    */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "wav decode: not a RIFF/WAVE container")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"wav decode: chunk $id overruns the container")
      id match {
        case "fmt " =>
          require(len >= 16, "wav decode: truncated fmt chunk")
          val tag = buf.getShort(pos + 8)
          val channels = buf.getShort(pos + 10)
          val bits = buf.getShort(pos + 22)
          require(tag == 1, s"wav decode: compressed format tag $tag — " +
            "only PCM is built in; route other codecs through MediaDecoder")
          require(channels == 1, s"wav decode: $channels channels, expected mono")
          require(bits == 16, s"wav decode: $bits bits/sample, expected 16")
          rate = buf.getInt(pos + 12)
        case "data" =>
          val n = len / 2
          data = Array.tabulate(n)(i => buf.getShort(pos + 8 + i * 2))
        case _ => () // LIST, fact, …: skip
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0, "wav decode: missing fmt chunk")
    require(data != null, "wav decode: missing data chunk")
    (rate, data)
  }

  /** Per-frame RMS energy over complete frames (a trailing partial frame
    * is dropped — deterministic, documented). Integer squares sum into a
    * Long (exact: frameSize · 2³⁰ bounds far below 2⁶³), one IEEE sqrt
    * per frame.
    */
  def frameRms(samples: Array[Short], frameSize: Int): Array[Double] = {
    require(frameSize > 0, s"frameRms: frameSize must be positive, got $frameSize")
    val nFrames = samples.length / frameSize
    Array.tabulate(nFrames) { f =>
      var sum = 0L
      var i = 0
      while (i < frameSize) {
        val s = samples(f * frameSize + i).toLong
        sum += s * s
        i += 1
      }
      math.sqrt(sum.toDouble / frameSize)
    }
  }
}
