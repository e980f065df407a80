package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnippetsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The QUICK brown fox jumps over the lazy dog near the river bank."),
    (2L, "nothing relevant here at all, just filler words and more filler"),
    (3L, "alpha beta gamma alpha beta")
  ).toDF("doc_id", "text")

  private def run(q: String, hitIds: Seq[Long], window: Int = 10) = {
    val qs = Seq((0L, q)).toDF("query_id", "query_text")
    val hits = hitIds.map((0L, _)).toDF("query_id", "doc_id")
    Snippets.snippets(hits, docs, qs, window)
      .orderBy("doc_id")
      .select("doc_id", "matched_term", "match_pos", "snippet")
      .as[(Long, Option[String], Int, String)].collect().toSeq
  }

  test("anchor is the earliest term; match is case-insensitive; casing preserved") {
    val Seq((_, term, pos, snip)) = run("dog quick", Seq(1L))
    // 'quick' occurs at 5, 'dog' at 46 — earliest wins
    assert(term.contains("quick"))
    assert(pos == 5)
    // window 10: start max(1, 5-10)=1, len 2*10+5=25
    assert(snip == "The QUICK brown fox jumps")
  }

  test("position tie breaks to the lexicographically smaller term") {
    // both terms first occur at position 1
    val Seq((_, term, pos, _)) = run("alpha beta", Seq(3L))
    assert(pos == 1)
    assert(term.contains("alpha"))
    val Seq((_, t2, _, _)) =
      run("beta alpha", Seq(3L)) // query order must not matter
    assert(t2.contains("alpha"))
  }

  test("window clamps at the document start and end") {
    val Seq((_, _, pos, snip)) = run("alpha", Seq(3L), window = 100)
    assert(pos == 1)
    assert(snip == "alpha beta gamma alpha beta") // whole (short) doc
  }

  test("a no-match hit still emits: null anchor, pos 0, document head") {
    val Seq((_, term, pos, snip)) = run("zebra", Seq(2L), window = 10)
    assert(term.isEmpty)
    assert(pos == 0)
    assert(snip == "nothing relevant her") // head, 2*window chars
  }

  test("per-hit independence across queries and docs") {
    val qs = Seq((0L, "fox"), (1L, "filler")).toDF("query_id", "query_text")
    val hits = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("query_id", "doc_id")
    val out = Snippets.snippets(hits, docs, qs, window = 5)
      .select("query_id", "doc_id", "matched_term")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(out == Set(
      (0L, 1L, Some("fox")), (0L, 2L, None), (1L, 2L, Some("filler"))))
  }

  test("a hit whose doc id is missing from docs still emits (null snippet)") {
    // takedown-raced hit: doc 99 is not in the docs frame — the row must
    // survive the presentation step, not silently vanish (ADVICE r12)
    val qs = Seq((0L, "fox")).toDF("query_id", "query_text")
    val hits = Seq((0L, 1L), (0L, 99L)).toDF("query_id", "doc_id")
    val out = Snippets.snippets(hits, docs, qs, window = 5)
      .orderBy("doc_id")
      .select("doc_id", "matched_term", "match_pos", "snippet")
      .as[(Long, Option[String], Int, Option[String])].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 99L))
    val (_, term, pos, snip) = out(1)
    assert(term.isEmpty && pos == 0 && snip.isEmpty)
  }

  test("refuses a non-positive window") {
    intercept[IllegalArgumentException] {
      Snippets.snippets(
        Seq((0L, 1L)).toDF("query_id", "doc_id"), docs,
        Seq((0L, "x")).toDF("query_id", "query_text"), window = 0)
    }
  }
}
