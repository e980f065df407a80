package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class TextSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("stripMarkup removes tags, scripts, styles, comments; decodes entities") {
    val cases = Seq(
      ("<p>hello</p>", "hello"),
      ("<a href=\"x\">link</a> tail", "link tail"),
      ("<script>var x = 1;</script>kept", "kept"),
      ("<style>p{color:red}</style>kept", "kept"),
      ("<!-- hidden -->shown", "shown"),
      ("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; f&nbsp;g", "a & b <c> \"d\" 'e' f g"),
      ("&amp;lt;", "&lt;"), // decode &amp; last: no double-decode
      ("<b>x</b><i>y</i>", "xy") // text nodes concatenated, no separator
    )
    val df = cases.toDF("html", "expected")
    val got = df.select(TextSources.stripMarkup($"html").as("clean"), $"expected")
      .as[(String, String)].collect()
    got.foreach { case (clean, exp) => assert(clean == exp) }
  }

  test("binaryFile dispatch reads a raw dir and routes by extension (S1/S2)") {
    val dir = Files.createTempDirectory("graft_ingest").toFile
    Files.writeString(new java.io.File(dir, "a.html").toPath,
      "<html><body><p>doc a</p></body></html>")
    Files.writeString(new java.io.File(dir, "b.xml").toPath,
      "<?xml version=\"1.0\"?><r><t>doc b</t></r>")
    Files.writeString(new java.io.File(dir, "c.txt").toPath, "plain text")
    val raw = TextSources.readRaw(spark, dir.getAbsolutePath)
    assert(raw.count() == 3)
    assert(raw.select("ext").as[String].collect().toSet == Set("html", "xml", "txt"))
    val docs = TextSources.htmlDocs(raw)
    val texts = docs.select("text").as[String].collect().toSet
    assert(texts == Set("doc a", "doc b"))
    // doc ids are stable content-independent path hashes
    assert(docs.select("doc_id").distinct().count() == 2)
  }

  test("flattenRows stringifies every column in order") {
    val df = Seq((1, "x", 2.5)).toDF("a", "b", "c")
    val got = TextSources.flattenRows(df).select("line").as[String].head()
    assert(got == "1 x 2.5")
  }

  test("flattenTable emits header + ordered rows") {
    val df = Seq((2, "two"), (1, "one")).toDF("k", "v")
    val got = TextSources.flattenTable(df, "k").select("text").as[String].head()
    assert(got == "k v\n1 one\n2 two")
  }

  test("unionCorpus aligns schemas by name and keeps all rows") {
    val a = Seq((1L, "t1")).toDF("doc_id", "text")
    val b = Seq(("t2", 2L)).toDF("text", "doc_id") // reversed column order
    val u = TextSources.unionCorpus(a, b)
    assert(u.count() == 2)
    assert(u.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
