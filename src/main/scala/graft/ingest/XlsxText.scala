package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** S6: XLSX → text, pure JVM (java.util.zip + StAX — both JDK built-ins,
  * no external dependency). The reference ACCEPTS `.xlsx` uploads and pins
  * openpyxl but has no processing branch, silently dropping them
  * (/root/reference/micro-infobot/app.py:191 vs 194-205) — this arm goes
  * beyond the reference and gives xlsx the same treatment its csv arm
  * gives: cells stringified, rows space-joined, lines newline-joined
  * (the `df.to_string(index=False)` flatten of app.py:204-205).
  *
  * Scope (the openpyxl-default analog of [[PdfText]]'s text-only scope):
  * shared strings (`t="s"`), inline strings (`t="inlineStr"`), formula
  * string results (`t="str"`), booleans (`t="b"` → TRUE/FALSE) and raw
  * numeric text are read from every `xl/worksheets/sheet*.xml` in
  * lexicographic entry order; number FORMATTING (dates, currency) is not
  * applied — the stored value is emitted, which is also what a csv export
  * of the raw grid yields. Encrypted/agile-encrypted workbooks (OLE, not
  * zip) fail the task loudly, matching the PdfText stance.
  *
  * Like every per-row extractor here it runs inside the scan stage via a
  * [[graft.functions.XlsxExtract]] expression — fully distributed, one
  * workbook per row, no driver involvement.
  */
object XlsxText {

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // workbook XML is data, not documents: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Extract the text grid of every worksheet. Rows are space-joined,
    * lines and sheets newline-joined. Empty cells vanish (space-join of
    * present cells only), empty rows emit no line — the flatten is lossy
    * by design, exactly like the reference's csv arm.
    */
  def extract(bytes: Array[Byte], maxEntryBytes: Int = DefaultMaxEntryBytes): String = {
    val entries = readZip(bytes, maxEntryBytes)
    require(entries.nonEmpty,
      "xlsx_extract: not a zip container (encrypted or corrupt workbook?)")
    val shared = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheets = sheetParts(entries)
    require(sheets.nonEmpty || entries.contains("xl/workbook.xml"),
      "xlsx_extract: no workbook.xml — not an xlsx container")
    sheets.map(n => parseSheet(entries(n), shared)).filter(_.nonEmpty)
      .mkString("\n")
  }

  /** Worksheet part names in workbook order. Primary resolution is the
    * OPC-correct one: `xl/workbook.xml`'s `<sheet r:id=…>` list (document
    * order = tab order) resolved through `xl/_rels/workbook.xml.rels` —
    * producers are free to name sheet parts ANYTHING, so the
    * `xl/worksheets/sheetN.xml` convention is only a FALLBACK (kept for
    * minimal containers without a rels part, e.g. [[pack]]'s, in numeric
    * order — plain lexicographic sorting would interleave sheet10..19
    * between sheet1 and sheet2). A workbook that DECLARES sheets none of
    * which resolve to a present part fails loudly instead of silently
    * extracting an empty string (the module's stated stance).
    */
  private def sheetParts(entries: Map[String, Array[Byte]]): Seq[String] = {
    val declared = entries.get("xl/workbook.xml")
      .map(workbookSheetRelIds).getOrElse(Seq.empty)
    val rels = entries.get("xl/_rels/workbook.xml.rels")
      .map(parseRels).getOrElse(Map.empty[String, String])
    val resolvedPerSheet: Seq[(String, Option[String])] = declared.map { id =>
      id -> rels.get(id).map(resolveTarget).filter(entries.contains)
    }
    val resolved = resolvedPerSheet.flatMap(_._2)
    if (resolved.nonEmpty) {
      // PARTIAL resolution is a truncated/corrupt container, not a
      // smaller workbook: if any declared sheet resolved, every declared
      // sheet must — silently extracting with sheets missing is exactly
      // the lossy failure this module refuses
      val missing = resolvedPerSheet.collect { case (id, None) => id }
      require(missing.isEmpty,
        s"xlsx_extract: workbook.xml declares ${declared.length} sheet(s) " +
          s"but ${missing.length} failed to resolve to a present part " +
          s"(${missing.take(3).mkString(", ")}) — truncated container?")
      resolved
    }
    else {
      val byName = entries.keys.filter(n =>
        n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml")).toSeq
        .sortBy { n =>
          val digits = n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml")
          (if (digits.forall(_.isDigit) && digits.nonEmpty) digits.toLong
           else Long.MaxValue, n)
        }
      require(byName.nonEmpty || declared.isEmpty,
        s"xlsx_extract: workbook.xml declares ${declared.length} sheet(s) " +
          s"but no worksheet part resolved (${rels.size} relationship(s) " +
          "parsed) — nonstandard part names without a readable rels part")
      byName
    }
  }

  private val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** `<sheet>` elements' `r:id` attributes from workbook.xml, in document
    * order (= the workbook's tab order).
    */
  private def workbookSheetRelIds(xml: Array[Byte]): Seq[String] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val ids = mutable.ArrayBuffer.empty[String]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          val id = Option(r.getAttributeValue(RelNs, "id"))
            .orElse(Option(r.getAttributeValue(null, "id")))
          id.foreach(ids += _)
        }
      }
    } finally r.close()
    ids.toSeq
  }

  /** workbook.xml.rels: relationship Id → Target (raw, unresolved). */
  private def parseRels(xml: Array[Byte]): Map[String, String] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = Map.newBuilder[String, String]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null) out += id -> target
        }
      }
    } finally r.close()
    out.result()
  }

  /** Resolve a rels Target against its base part dir (`xl/`): absolute
    * targets (`/xl/…`) strip the slash, relative ones prefix `xl/`, and
    * `.`/`..` segments normalize away.
    */
  private def resolveTarget(target: String): String = {
    val abs = if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
    abs.split("/").foldLeft(List.empty[String]) {
      case (acc, "." | "") => acc
      case (acc, "..") => if (acc.isEmpty) acc else acc.init
      case (acc, seg) => acc :+ seg
    }.mkString("/")
  }

  /** Per-entry inflation cap: a zip-bomb workbook (KBs compressed, GBs
    * inflated) must fail the row loudly, not OOM the executor.
    */
  private val DefaultMaxEntryBytes: Int = 256 << 20

  private def readZip(bytes: Array[Byte], maxEntryBytes: Int): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new ByteArrayOutputStream(math.min(1 << 16, maxEntryBytes))
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0) {
            require(buf.size.toLong + n <= maxEntryBytes,
              s"xlsx_extract: entry ${e.getName} inflates past $maxEntryBytes " +
                "bytes (zip bomb or corrupt workbook)")
            buf.write(chunk, 0, n)
            n = zin.read(chunk)
          }
          out += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } catch {
      case _: java.util.zip.ZipException => return Map.empty
    } finally zin.close()
    out.result()
  }

  /** sharedStrings.xml → indexed strings. Each `<si>` concatenates all its
    * `<t>` descendants (plain and rich-text runs alike).
    */
  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val acc = mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.setLength(0)
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = false; acc += cur.toString
              case "t" => inT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    acc.toIndexedSeq
  }

  /** One worksheet → flattened lines. Each cell buffers until `</c>` so
    * multi-run inline strings (`<is><t>a</t><t>b</t></is>`) fold into ONE
    * cell value, like rich-text runs do in `<si>`.
    */
  private def parseSheet(xml: Array[Byte], shared: IndexedSeq[String]): String = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val lines = mutable.ArrayBuffer.empty[String]
    val row = mutable.ArrayBuffer.empty[String]
    val run = new java.lang.StringBuilder // one <v>/<t> text node
    val cell = new java.lang.StringBuilder // accumulated cell value
    var cellType = ""
    var hasValue = false
    var capture = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row.clear()
              case "c" =>
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                cell.setLength(0); hasValue = false
              case "v" | "t" => capture = true; run.setLength(0)
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (capture) run.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                if (row.nonEmpty) lines += row.mkString(" ")
              case "v" =>
                capture = false; hasValue = true
                cell.append(cellType match {
                  case "s" =>
                    val i = run.toString.trim.toInt
                    if (i >= 0 && i < shared.length) shared(i) else ""
                  case "b" => if (run.toString.trim == "1") "TRUE" else "FALSE"
                  case _ => run.toString // "str", numeric, plain
                })
              case "t" =>
                capture = false
                if (cellType == "inlineStr") { hasValue = true; cell.append(run) }
              case "c" =>
                if (hasValue) row += cell.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    lines.mkString("\n")
  }

  /** Minimal deterministic workbook writer — one sheet, inline-string
    * cells — used by the s6 roundtrip query and tests to synthesize real
    * xlsx containers without an offline library. STORED (uncompressed)
    * entries: byte-stability does not depend on a Deflater version.
    */
  def pack(rows: Seq[Seq[String]]): Array[Byte] = {
    val sheetXml = {
      val sb = new java.lang.StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
      sb.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      rows.zipWithIndex.foreach { case (cells, ri) =>
        sb.append(s"""<row r="${ri + 1}">""")
        cells.zipWithIndex.foreach { case (v, ci) =>
          val ref = colRef(ci) + (ri + 1)
          sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${escapeXml(v)}</t></is></c>""")
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString.getBytes(StandardCharsets.UTF_8)
    }
    val workbookXml =
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets>""" +
        """</workbook>""").getBytes(StandardCharsets.UTF_8)
    val contentTypes =
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>""").getBytes(StandardCharsets.UTF_8)
    zipStored(Seq(
      "[Content_Types].xml" -> contentTypes,
      "xl/workbook.xml" -> workbookXml,
      "xl/worksheets/sheet1.xml" -> sheetXml))
  }

  private def colRef(ci: Int): String = {
    var i = ci
    val sb = new java.lang.StringBuilder
    while (i >= 0) { sb.insert(0, ('A' + i % 26).toChar); i = i / 26 - 1 }
    sb.toString
  }

  private def escapeXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def zipStored(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.setMethod(ZipOutputStream.STORED)
    entries.foreach { case (name, bytes) =>
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.STORED)
      e.setSize(bytes.length)
      e.setCompressedSize(bytes.length)
      val crc = new java.util.zip.CRC32
      crc.update(bytes)
      e.setCrc(crc.getValue)
      e.setTime(0L) // fixed timestamp: container bytes are run-invariant
      zos.putNextEntry(e)
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
