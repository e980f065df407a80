package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SectionizerSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES.md reference-shaped input (app.py:86-107 semantics)
  private val doc =
    "INTRO TITLE\n\npara1\n\npara2\n\nNEXT SECTION\n\npara3"

  test("titles: ALL-CAPS lines longer than 5, near-misses rejected") {
    val docs = Seq(
      (1L, "POLITICA DE VACACIONES\nbody"),
      (2L, "SHORT\nbody"),          // len 5, not > 5
      (3L, "Mixed Case Title\nbody"),
      (4L, "TITLE9 WITH DIGIT\nbody"),
      (5L, "  SPACED TITLE  \nbody") // trimmed before match
    ).toDF("doc_id", "text")
    val got = Sectionizer.titles(docs).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "POLITICA DE VACACIONES"), (5L, "SPACED TITLE")))
  }

  test("sectionize assigns paragraphs to nearest preceding title; titles consumed") {
    val docs = Seq((1L, doc)).toDF("doc_id", "text")
    val got = Sectionizer.sectionize(docs)
      .orderBy("pos")
      .select("section", "paragraph")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("INTRO TITLE", "para1"),
      ("INTRO TITLE", "para2"),
      ("NEXT SECTION", "para3")))
  }

  test("text before any title gets section General") {
    val docs = Seq((1L, "leading para\n\nINTRO TITLE\n\nafter")).toDF("doc_id", "text")
    val got = Sectionizer.sectionize(docs).orderBy("pos")
      .select("section", "paragraph").as[(String, String)].collect().toSeq
    assert(got == Seq(("General", "leading para"), ("INTRO TITLE", "after")))
  }

  test("order sensitivity survives repartition") {
    val docs = Seq((1L, doc), (2L, doc)).toDF("doc_id", "text").repartition(4)
    val got = Sectionizer.sectionize(docs)
      .where($"doc_id" === 2).orderBy("pos")
      .select("section").as[String].collect().toSeq
    assert(got == Seq("INTRO TITLE", "INTRO TITLE", "NEXT SECTION"))
  }

  test("chunker tags chunks with section and keeps per-paragraph indexing") {
    val long = ("alpha beta gamma " * 40).trim // ~680 chars -> >1 chunk
    val docs = Seq((1L, s"MY SECTION\n\n$long")).toDF("doc_id", "text")
    val chunks = Chunker.chunk(Sectionizer.sectionize(docs))
    val rows = chunks.orderBy("chunk_idx")
      .select("section", "chunk_idx", "chunk")
      .as[(String, Long, String)].collect().toSeq
    assert(rows.length > 1)
    assert(rows.forall(_._1 == "MY SECTION"))
    assert(rows.map(_._2) == rows.indices.map(_.toLong))
    assert(rows.forall(_._3.length <= 500))
  }

  test("generator chunker returns identical rows to the UDF formulation") {
    val texts = Seq(
      (1L, "MY SECTION\n\n" + ("alpha beta gamma " * 60).trim),
      (2L, ("x" * 700) + "\n\nshort para"),
      (3L, (1 to 300).map(i => s"sentence $i").mkString(". ")))
      .toDF("doc_id", "text")
    val sections = Sectionizer.sectionize(texts)
    val gen = Chunker.chunk(sections)
      .select("doc_id", "pos", "chunk_idx", "chunk")
      .as[(Long, Long, Long, String)].collect().toSet
    val viaUdf = Chunker.chunkUdf(sections)
      .select("doc_id", "pos", "chunk_idx", "chunk")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(gen == viaUdf)
    assert(gen.nonEmpty)
  }

  test("chunk ids stay collision-free on a 2000-paragraph document") {
    val text = (0 until 2000).map(i => s"para $i content").mkString("\n\n")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val idx = graft.index.VectorIndex.build(docs)
    val n = idx.count()
    assert(n >= 2000L)
    assert(idx.select("chunk_id").distinct().count() == n)
  }
}
