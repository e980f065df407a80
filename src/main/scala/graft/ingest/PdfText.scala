package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16BE}
import java.util.zip.Inflater

/** Minimal pure-JVM text extraction for text-only PDFs — the reference's
  * primary input path (`/root/reference/micro-infobot/app.py:200-202`,
  * per-page `fitz` extraction), re-implemented from the PUBLIC PDF spec
  * (ISO 32000: §7.3 objects, §7.4.4 FlateDecode, §9.4 text-showing
  * operators) with zero dependencies beyond `java.util.zip`.
  *
  * Strategy (robust for "simple generator" text PDFs, not a full reader):
  *  1. scan the byte stream for `stream … endstream` segments, bounding
  *     each by its dictionary's /Length when it is a direct or resolvable
  *     indirect integer, else by the next `endstream` marker;
  *  2. FlateDecode-inflate when the dictionary says so (truncated/corrupt
  *     streams are skipped, never fatal);
  *  3. any decoded stream containing a `BT … ET` text block is tokenized
  *     and the string arguments of the text-showing operators `Tj`, `'`,
  *     `"` and `TJ` are emitted. Literal strings handle nesting, the
  *     `\`-escapes and octal codes; hex strings handle odd-length padding;
  *     a UTF-16BE BOM switches the string's charset, else PDFDocEncoding
  *     is approximated as Latin-1.
  *
  * Line structure is approximated from the text-positioning operators
  * (`T*`, `'`, `"`, `Td`/`TD` with a vertical component, `Tm`) and TJ
  * kerning gaps below −180/1000 em become spaces — the same heuristics
  * naive extractors use. Out of scope, by design (each detected and
  * refused or skipped, never silently wrong): encrypted files (/Encrypt →
  * refuse), font-subset PDFs whose /ToUnicode remapping makes bytes
  * non-textual (garbage in, garbage out — a full CMap reader is a
  * library-sized job), and image-only pages (no text operators → empty).
  */
object PdfText {

  /** Extract text, one string for the whole document (streams in file
    * order, blank line between streams). Throws on non-PDF input and on
    * encrypted PDFs; a PDF with no extractable text returns "".
    */
  def extract(bytes: Array[Byte]): String = {
    require(bytes.length >= 5 && new String(bytes, 0, 5, ISO_8859_1) == "%PDF-",
      "not a PDF: missing %PDF- header")
    val raw = new String(bytes, ISO_8859_1) // 1:1 byte↔char, index-stable
    if (raw.contains("/Encrypt"))
      throw new IllegalArgumentException(
        "encrypted PDF: text extraction requires the decryption key")
    val out = new StringBuilder
    var from = 0
    while ({ val i = raw.indexOf("stream", from); i >= 0 }) {
      val i = raw.indexOf("stream", from)
      // not "endstream"/"/Filter/AStream" etc.: must be the keyword
      val isKeyword = (i == 0 || !raw.charAt(i - 1).isLetter) &&
        (i + 6 >= raw.length || !raw.charAt(i + 6).isLetter)
      if (!isKeyword) { from = i + 6 }
      else {
        val dict = dictBefore(raw, i)
        val dataStart = i + 6 + (raw.drop(i + 6).take(2) match {
          case s if s.startsWith("\r\n") => 2
          case s if s.startsWith("\n") || s.startsWith("\r") => 1
          case _ => 0
        })
        val end = streamEnd(raw, dict, dataStart)
        val data = bytes.slice(dataStart, end)
        val decoded =
          if (dict.contains("/FlateDecode")) inflate(data) else Some(data)
        decoded.map(new String(_, ISO_8859_1)).foreach { content =>
          if (content.contains("BT")) {
            val text = extractTextOps(content)
            if (text.nonEmpty) {
              if (out.nonEmpty) out.append("\n")
              out.append(text)
            }
          }
        }
        from = math.max(end, dataStart + 1)
      }
    }
    out.toString.trim
  }

  /** The object dictionary governing the stream keyword at `streamIdx`:
    * the text between the nearest preceding `obj` (or file start) and the
    * keyword — enough to read /Filter and /Length without a full object
    * parser.
    */
  private def dictBefore(raw: String, streamIdx: Int): String = {
    val objIdx = raw.lastIndexOf(" obj", streamIdx) max raw.lastIndexOf("\nobj", streamIdx)
    raw.substring(math.max(0, objIdx), streamIdx)
  }

  private val LenDirect = """/Length\s+(\d+)(?!\s+\d+\s+R)""".r
  private val LenIndirect = """/Length\s+(\d+)\s+(\d+)\s+R""".r

  private def streamEnd(raw: String, dict: String, dataStart: Int): Int = {
    val byLength = LenDirect.findFirstMatchIn(dict).map(_.group(1).toInt)
      .orElse(LenIndirect.findFirstMatchIn(dict).flatMap { m =>
        // resolve `N G R`: find `N G obj <int> endobj`
        val pat = ("""(?s)[^0-9]""" + m.group(1) + """\s+""" + m.group(2) +
          """\s+obj\s*(\d+)\s*endobj""").r
        pat.findFirstMatchIn(raw).map(_.group(1).toInt)
      })
      .map(dataStart + _)
      .filter(e => e <= raw.length &&
        raw.indexOf("endstream", e) - e <= 2 && raw.indexOf("endstream", e) >= 0)
    byLength.getOrElse {
      val e = raw.indexOf("endstream", dataStart)
      if (e < 0) raw.length else e
    }
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) throw new IllegalStateException("preset dict")
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  // ---------------------------------------------- content-stream scanner

  /** One pass over a decoded content stream: pushes strings and numbers,
    * emits on the text-showing operators, newlines on the positioners.
    */
  private def extractTextOps(content: String): String = {
    val sb = new StringBuilder
    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb.append('\n')
    var i = 0
    val n = content.length
    // operand stacks: last string seen, last numbers seen, TJ array parts
    var lastString: String = null
    val nums = collection.mutable.ArrayBuffer.empty[Double]
    var inArray = false
    val arrayParts = collection.mutable.ArrayBuffer.empty[Either[String, Double]]

    def flushShown(s: String): Unit = sb.append(s)

    while (i < n) {
      val c = content.charAt(i)
      c match {
        case '(' =>
          val (s, next) = literalString(content, i)
          if (inArray) arrayParts += Left(s) else lastString = s
          i = next
        case '<' if i + 1 < n && content.charAt(i + 1) == '<' =>
          i += 2 // dict open — tokens inside parse harmlessly
        case '<' =>
          val (s, next) = hexString(content, i)
          if (inArray) arrayParts += Left(s) else lastString = s
          i = next
        case '[' => inArray = true; arrayParts.clear(); i += 1
        case ']' => inArray = false; i += 1
        case d if d == '+' || d == '-' || d == '.' || d.isDigit =>
          val start = i
          i += 1
          while (i < n && (content.charAt(i).isDigit || content.charAt(i) == '.')) i += 1
          val v = try content.substring(start, i).toDouble catch { case _: Exception => 0.0 }
          if (inArray) arrayParts += Right(v) else { nums += v; if (nums.size > 6) nums.remove(0) }
        case '/' =>
          i += 1
          while (i < n && !isDelim(content.charAt(i))) i += 1
        case '%' => // comment to EOL
          while (i < n && content.charAt(i) != '\n' && content.charAt(i) != '\r') i += 1
        case ch if ch.isLetter || ch == '\'' || ch == '"' || ch == '*' =>
          val start = i
          i += 1
          while (i < n && (content.charAt(i).isLetterOrDigit ||
            content.charAt(i) == '*' || content.charAt(i) == '\'')) i += 1
          content.substring(start, i) match {
            case "Tj" => if (lastString != null) { flushShown(lastString); lastString = null }
            case "TJ" =>
              arrayParts.foreach {
                case Left(s) => flushShown(s)
                case Right(v) => if (v <= -180.0) flushShown(" ")
              }
              arrayParts.clear()
            case "'" =>
              newline(); if (lastString != null) { flushShown(lastString); lastString = null }
            case "\"" =>
              newline(); if (lastString != null) { flushShown(lastString); lastString = null }
            case "T*" => newline()
            case "Td" | "TD" =>
              // ty is the LAST operand; a vertical move starts a new line
              if (nums.nonEmpty && nums.last != 0.0) newline()
              nums.clear()
            case "Tm" => newline(); nums.clear()
            case "BT" | "ET" => nums.clear(); lastString = null
            case _ => nums.clear()
          }
        case _ => i += 1
      }
    }
    sb.toString
  }

  private def isDelim(c: Char): Boolean =
    c.isWhitespace || "()<>[]{}/%".indexOf(c.toInt) >= 0

  /** PDF literal string: nesting parens, backslash escapes, octal codes,
    * escaped-newline continuation (§7.3.4.2). Returns (decoded, nextIdx).
    */
  private def literalString(content: String, open: Int): (String, Int) = {
    val bytes = new ByteArrayOutputStream()
    var depth = 1
    var i = open + 1
    val n = content.length
    while (i < n && depth > 0) {
      val c = content.charAt(i)
      c match {
        case '\\' if i + 1 < n =>
          val e = content.charAt(i + 1)
          e match {
            case 'n' => bytes.write('\n'); i += 2
            case 'r' => bytes.write('\r'); i += 2
            case 't' => bytes.write('\t'); i += 2
            case 'b' => bytes.write('\b'); i += 2
            case 'f' => bytes.write('\f'); i += 2
            case '(' => bytes.write('('); i += 2
            case ')' => bytes.write(')'); i += 2
            case '\\' => bytes.write('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += (if (i + 2 < n && content.charAt(i + 2) == '\n') 3 else 2)
            case o if o >= '0' && o <= '7' =>
              var oct = 0; var k = 0; i += 1
              while (k < 3 && i < n && content.charAt(i) >= '0' && content.charAt(i) <= '7') {
                oct = oct * 8 + (content.charAt(i) - '0'); i += 1; k += 1
              }
              bytes.write(oct & 0xff)
            case other => bytes.write(other.toInt); i += 2
          }
        case '(' => depth += 1; bytes.write('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) bytes.write(')')
          i += 1
        case ch => bytes.write(ch.toInt & 0xff); i += 1
      }
    }
    (decodeStringBytes(bytes.toByteArray), i)
  }

  /** PDF hex string `<48656C…>`; odd final digit padded with 0 (§7.3.4.3). */
  private def hexString(content: String, open: Int): (String, Int) = {
    val close = content.indexOf('>', open + 1)
    val end = if (close < 0) content.length else close
    val digits = content.substring(open + 1, end).filter(c =>
      Character.digit(c, 16) >= 0)
    val padded = if (digits.length % 2 == 1) digits + "0" else digits
    val bytes = padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    (decodeStringBytes(bytes), end + 1)
  }

  private def decodeStringBytes(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, UTF_16BE)
    else new String(b, ISO_8859_1)

  // ---------------------------------------------- minimal PDF synthesis

  /** Synthesize a minimal single-page text PDF (one `Tj` per line, `T*`
    * line advances) — the test/scaffold twin of [[extract]], so ingest
    * can be driven end-to-end from genuine `.pdf` files with no PDF
    * library in the container. Optional Flate compression exercises the
    * decode path.
    */
  def synthesize(lines: Seq[String], compress: Boolean = false): Array[Byte] = {
    def escape(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c => c.toString
      }
    val body = lines.map(l => s"(${escape(l)}) Tj T*").mkString("\n")
    val contentPlain = s"BT /F1 12 Tf 14 TL 72 720 Td\n$body\nET"
      .getBytes(ISO_8859_1)
    val (content, filter) =
      if (compress) {
        val d = new java.util.zip.Deflater()
        d.setInput(contentPlain); d.finish()
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        (out.toByteArray, "/Filter /FlateDecode ")
      } else (contentPlain, "")
    val header = "%PDF-1.4\n"
    val objs = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      s"4 0 obj << $filter/Length ${content.length} >> stream\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val out = new ByteArrayOutputStream()
    out.write(header.getBytes(ISO_8859_1))
    objs.take(4).foreach(o => out.write(o.getBytes(ISO_8859_1)))
    out.write(content)
    out.write("\nendstream endobj\n".getBytes(ISO_8859_1))
    out.write(objs(4).getBytes(ISO_8859_1))
    out.write("trailer << /Root 1 0 R >>\n%%EOF\n".getBytes(ISO_8859_1))
    out.toByteArray
  }
}
