package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S6 XLSX: pure-JVM extraction semantics (shared/inline/numeric/boolean
  * cells, rich-text runs, multiple sheets), the pack→extract roundtrip the
  * s6 query pins, dispatch integration, and the loud-failure stance.
  */
class XlsxSpec extends SparkSpec {
  import java.nio.charset.StandardCharsets.UTF_8

  // hand-built workbook exercising every cell type XlsxText scopes:
  // sharedStrings (incl. a rich-text <si> with two runs), inline strings,
  // numeric, boolean, formula-string, an empty row, and two sheets.
  private def handWorkbook: Array[Byte] = {
    val shared =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>alpha</t></si>
        |<si><r><t>ri</t></r><r><t>ch</t></r></si>
        |<si><t xml:space="preserve">has &amp;amp;</t></si>
        |</sst>""".stripMargin.getBytes(UTF_8)
    val sheet1 =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1"><v>42.5</v></c></row>
        |<row r="2"/>
        |<row r="3"><c r="A3" t="b"><v>1</v></c><c r="B3" t="str"><v>SUMMED</v></c>
        |<c r="C3" t="inlineStr"><is><t>in</t><t>line</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin.getBytes(UTF_8)
    val sheet2 =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin.getBytes(UTF_8)
    val workbook =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"/>""".stripMargin.getBytes(UTF_8)
    zip(Seq(
      "xl/workbook.xml" -> workbook,
      "xl/sharedStrings.xml" -> shared,
      "xl/worksheets/sheet1.xml" -> sheet1,
      "xl/worksheets/sheet2.xml" -> sheet2))
  }

  private def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("extract: shared/rich/inline/numeric/boolean/formula cells, sheets in order") {
    val text = XlsxText.extract(handWorkbook)
    assert(text ==
      "alpha rich 42.5\nTRUE SUMMED inline\nhas &amp;")
  }

  test("empty rows vanish; sheet with no rows contributes nothing") {
    val wb = zip(Seq(
      "xl/workbook.xml" -> "<workbook/>".getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData><row r="1"/></sheetData></worksheet>""".getBytes(UTF_8)))
    assert(XlsxText.extract(wb) == "")
  }

  test("non-zip (encrypted/corrupt) input fails loudly, like PdfText") {
    val err = intercept[IllegalArgumentException] {
      XlsxText.extract("this is not a zip".getBytes(UTF_8))
    }
    assert(err.getMessage.contains("xlsx_extract"))
  }

  test("zip without workbook.xml fails loudly") {
    val wb = zip(Seq("mimetype" -> "application/epub".getBytes(UTF_8)))
    intercept[IllegalArgumentException] { XlsxText.extract(wb) }
  }

  test("pack -> extract roundtrip is exact (the s6 oracle premise)") {
    val grid = Seq(
      Seq("doc_id", "lang", "source"),
      Seq("7", "de", "src3"),
      Seq("needs <escaping> & stuff", "", "end"))
    assert(XlsxText.extract(XlsxText.pack(grid)) ==
      "doc_id lang source\n7 de src3\nneeds <escaping> & stuff  end")
  }

  test("pack is byte-deterministic (STORED entries, fixed timestamps)") {
    val grid = Seq(Seq("a", "b"), Seq("c"))
    assert(XlsxText.pack(grid).toSeq == XlsxText.pack(grid).toSeq)
  }

  test("12 sheets flatten in numeric order, not lexicographic (sheet2 before sheet10)") {
    val sheets = (1 to 12).map { i =>
      s"xl/worksheets/sheet$i.xml" ->
        s"""<worksheet><sheetData><row r="1"><c t="inlineStr"><is><t>s$i</t></is></c></row></sheetData></worksheet>"""
          .getBytes(UTF_8)
    }
    val wb = zip(("xl/workbook.xml" -> "<workbook/>".getBytes(UTF_8)) +: sheets)
    assert(XlsxText.extract(wb) == (1 to 12).map(i => s"s$i").mkString("\n"))
  }

  test("an entry inflating past the cap fails loudly (zip-bomb guard)") {
    val wb = XlsxText.pack(Seq(Seq("a cell comfortably past a tiny cap")))
    val err = intercept[IllegalArgumentException] {
      XlsxText.extract(wb, maxEntryBytes = 16)
    }
    assert(err.getMessage.contains("inflates past"))
    // the same workbook is fine at the default cap
    assert(XlsxText.extract(wb).nonEmpty)
  }

  test("property: 200 random grids roundtrip exactly through pack -> extract") {
    // deterministic generator over the XML-representable alphabet:
    // printable ASCII incl. &<>"', plus some multibyte; \n survives inside
    // a cell; \r is excluded because the XML spec normalizes it to \n
    val alphabet: IndexedSeq[String] =
      (' ' to '~').map(_.toString) ++
        Seq("ä", "ö", "ü", "ß", "é", "ñ", "中", "文", "🙂", "\n")
    val rnd = new scala.util.Random(42)
    def randCell(): String =
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 200).foreach { i =>
      val grid = (0 until 1 + rnd.nextInt(4)).map(_ =>
        (0 until 1 + rnd.nextInt(5)).map(_ => randCell()))
      val expected = grid.map(_.mkString(" ")).filter(_.nonEmpty).mkString("\n")
      val got = XlsxText.extract(XlsxText.pack(grid))
      // pack emits every row; extract drops rows whose cells are all
      // empty-joined to "" only when the row has no cells — rows of empty
      // strings still carry cells, so they survive as runs of spaces
      val expectedKept = grid.filter(_.nonEmpty).map(_.mkString(" ")).mkString("\n")
      def esc(s: String) = s.map(c => if (c < ' ') f"\\u${c.toInt}%04x" else c.toString).mkString
      assert(got == expectedKept,
        s"grid #$i mismatch:\nGRID=${grid.map(_.map(esc))}\nEXP=[${esc(expectedKept)}]\nGOT=[${esc(got)}]")
    }
  }

  test("expressions: xlsx_pack/xlsx_extract roundtrip distributively + SQL") {
    import spark.implicits._
    graft.functions.TextExpressions.register(spark)
    val df = Seq((1L, "hello", "world"), (2L, "spark", "xlsx"))
      .toDF("id", "a", "b")
      .withColumn("wb", graft.functions.TextExpressions.xlsxPack(
        array(array(col("a"), col("b")))))
    val out = df.select(col("id"),
      graft.functions.TextExpressions.xlsxExtract(col("wb")).as("text"))
      .orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("hello world", "spark xlsx"))
    df.createOrReplaceTempView("wbs")
    assert(spark.sql("SELECT xlsx_extract(wb) FROM wbs WHERE id = 1")
      .head.getString(0) == "hello world")
  }

  test("nonstandard part names resolve through workbook.xml.rels, tab order kept") {
    // producer names its sheet parts freely (the OPC contract): discovery
    // must go workbook.xml <sheet r:id> -> rels Target, not the
    // xl/worksheets/sheetN.xml convention. Tab order (document order of
    // <sheet> elements) wins over any name ordering: "zz_last" is rId1.
    val wb =
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="First" sheetId="1" r:id="rId1"/>""" +
        """<sheet name="Second" sheetId="2" r:id="rId2"/></sheets></workbook>""").getBytes(UTF_8)
    val rels =
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/zz_last.xml"/>""" +
        """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="/xl/worksheets/aa_first.xml"/>""" +
        """</Relationships>""").getBytes(UTF_8)
    def sheet(v: String) =
      (s"""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        s"""<row r="1"><c r="A1" t="inlineStr"><is><t>$v</t></is></c></row>""" +
        """</sheetData></worksheet>""").getBytes(UTF_8)
    val bytes = zip(Seq(
      "xl/workbook.xml" -> wb,
      "xl/_rels/workbook.xml.rels" -> rels,
      "xl/worksheets/zz_last.xml" -> sheet("one"),
      "xl/worksheets/aa_first.xml" -> sheet("two")))
    assert(XlsxText.extract(bytes) == "one\ntwo")
  }

  test("declared sheets with no resolvable part fail loudly, not empty output") {
    val wb =
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Only" sheetId="1" r:id="rId1"/></sheets></workbook>""").getBytes(UTF_8)
    // sheet part named outside the convention AND no rels part: before the
    // rels resolution this silently extracted "" — now it must refuse
    val bytes = zip(Seq(
      "xl/workbook.xml" -> wb,
      "xl/worksheets/custom_name.xml" ->
        """<worksheet><sheetData/></worksheet>""".getBytes(UTF_8)))
    val e = intercept[IllegalArgumentException](XlsxText.extract(bytes))
    assert(e.getMessage.contains("no worksheet part resolved"))
  }

  test("xlsxDocs dispatch arm: only .xlsx rows, text extracted") {
    import spark.implicits._
    val raw = Seq(
      ("/in/a.xlsx", "xlsx", XlsxText.pack(Seq(Seq("cell", "grid")))),
      ("/in/b.pdf", "pdf", Array[Byte](1, 2, 3)))
      .toDF("path", "ext", "content")
    val out = TextSources.xlsxDocs(raw).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("text") == "cell grid")
    assert(out.head.getAs[String]("source") == "/in/a.xlsx")
  }
}
