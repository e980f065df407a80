package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Video arm of the multimodal seam — the [[WavAudio]] sibling: a REAL
  * container codec for MJPEG-flavored AVI (the RIFF video container:
  * `RIFF('AVI '){ LIST(hdrl){ avih, LIST(strl){ strh, strf } },
  * LIST(movi){ 00dc … } }`), chunk-walked byte-for-byte on decode and
  * written canonically on encode — so the video pipeline exercises
  * genuine container parsing like m5's `javax.imageio` and m6's WAV
  * arms, not an offset stub. Each `00dc` payload is one
  * compressed-image frame; PIXEL decoding of a frame stays behind the
  * [[MediaDecoder]] seam (the JDK reads JPEG/PNG/BMP/GIF payloads;
  * codecs it cannot read route through an external decoder), which is
  * exactly the boundary a 100 TB media pipeline draws: the container
  * walk is cheap scan-stage byte work, the pixel decode is the
  * pluggable expensive part.
  *
  * Non-AVI input fails the row loudly (the [[graft.ingest.PdfText]] /
  * [[WavAudio]] stance); truncated or overrunning chunks refuse rather
  * than misparse.
  */
object AviVideo {

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal MJPEG AVI from frame payloads (each one compressed-image
    * bytes). The encode twin of [[decode]] — the `wav_pack`/`xlsx_pack`
    * stance: tests and queries synthesize real containers
    * distributively. `fps` must divide 1,000,000 evenly enough to
    * round-trip (any fps in [1, 1e6]).
    */
  def pack(frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int): Array[Byte] = {
    require(fps > 0 && fps <= 1000000, s"avi pack: fps must be in [1, 1e6], got $fps")
    require(width > 0 && height > 0, s"avi pack: bad dims ${width}x$height")
    frames.foreach(f => require(f != null, "avi pack: null frame payload"))
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl'+avih+LIST(strl)
    val riffBody = 4 + (8 + hdrlBody) + (8 + 4 + moviBody) // 'AVI '+LIST(hdrl)+LIST(movi)
    val buf = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(fcc("RIFF")).putInt(riffBody).put(fcc("AVI "))
    // LIST hdrl
    buf.put(fcc("LIST")).putInt(hdrlBody).put(fcc("hdrl"))
    //   avih: MainAVIHeader (14 dwords)
    buf.put(fcc("avih")).putInt(56)
      .putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
      .putInt(frames.length) // dwTotalFrames
      .putInt(0).putInt(1).putInt(0) // initialFrames, streams, bufSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    //   LIST strl
    buf.put(fcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(fcc("strl"))
    //     strh: AVIStreamHeader
    buf.put(fcc("strh")).putInt(56)
      .put(fcc("vids")).put(fcc("MJPG"))
      .putInt(0) // flags
      .putShort(0).putShort(0) // priority, language
      .putInt(0) // initialFrames
      .putInt(1).putInt(fps) // scale, rate => rate/scale = fps
      .putInt(0) // start
      .putInt(frames.length) // length (frames)
      .putInt(0).putInt(-1).putInt(0) // bufSize, quality, sampleSize
      .putShort(0).putShort(0) // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    //     strf: BITMAPINFOHEADER
    buf.put(fcc("strf")).putInt(40)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24) // planes, bitcount
      .put(fcc("MJPG")) // biCompression
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST movi
    buf.put(fcc("LIST")).putInt(4 + moviBody).put(fcc("movi"))
    frames.foreach { f =>
      buf.put(fcc("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte) // word alignment
    }
    buf.array()
  }

  /** Parse an AVI: returns (width, height, fps, frame payloads). Walks
    * the RIFF chunk tree (unknown chunks/lists — idx1, INFO, JUNK — are
    * skipped), collects `##dc`/`##db` frame chunks from `movi` in file
    * order, and reads dims + frame rate from `avih`. Refuses loudly:
    * not-RIFF/AVI, overrunning chunks, missing avih or movi.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Seq[Array[Byte]]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI ",
      "avi decode: not a RIFF/AVI container")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var width = -1; var height = -1; var usPerFrame = -1
    var strhScale = -1; var strhRate = -1
    val frames = Seq.newBuilder[Array[Byte]]
    var sawMovi = false

    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        require(len >= 0 && pos + 8 + len <= to,
          s"avi decode: chunk $id overruns the container")
        id match {
          case "LIST" =>
            require(len >= 4, "avi decode: truncated LIST")
            val listType = new String(bytes, pos + 8, 4, "US-ASCII")
            if (listType == "movi") sawMovi = true
            walk(pos + 12, pos + 8 + len, inMovi || listType == "movi")
          case "avih" =>
            require(len >= 56, "avi decode: truncated avih")
            usPerFrame = buf.getInt(pos + 8)
            width = buf.getInt(pos + 40)
            height = buf.getInt(pos + 44)
          case "strh" if len >= 56 &&
              new String(bytes, pos + 8, 4, "US-ASCII") == "vids" &&
              strhScale <= 0 =>
            // the video stream's EXACT frame rate: rate/scale — avih's
            // dwMicroSecPerFrame is integer-truncated at pack time, so
            // any fps that does not divide 1e6 would drift through it
            strhScale = buf.getInt(pos + 28)
            strhRate = buf.getInt(pos + 32)
          case f if inMovi && isFrameChunk(f) =>
            frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
          case _ => () // strh/strf handled via avih; idx1/JUNK/INFO: skip
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
    }
    walk(12, math.min(bytes.length, 8 + buf.getInt(4)), inMovi = false)
    require(width > 0 && height > 0 && usPerFrame > 0,
      "avi decode: missing or invalid avih header")
    require(sawMovi, "avi decode: missing movi list")
    val fps =
      if (strhScale > 0 && strhRate > 0)
        math.round(strhRate.toDouble / strhScale).toInt // exact: pack writes scale=1
      else math.round(1000000.0 / usPerFrame).toInt // foreign file without strh
    (width, height, fps, frames.result())
  }
}
