package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PhraseCount: the codegen adjacency counter under b7/b7b — edge cases
  * and a randomized sweep against a naive driver-side reference.
  */
class PhraseCountSpec extends SparkSpec {
  import spark.implicits._

  private def naive(toks: Vector[String], ph: Vector[String]): Long =
    if (ph.isEmpty || ph.length > toks.length) 0L
    else (0 to toks.length - ph.length)
      .count(i => toks.slice(i, i + ph.length) == ph).toLong

  test("hand cases: overlap, containment, boundary, empty phrase") {
    val cases = Seq(
      (Vector("a", "a", "a"), Vector("a", "a"), 2L), // overlapping windows count
      (Vector("a", "b", "a", "b"), Vector("a", "b"), 2L),
      (Vector("a", "b"), Vector("b", "a"), 0L), //      order matters
      (Vector("a"), Vector("a"), 1L),
      (Vector("a"), Vector("a", "b"), 0L), //           phrase longer than doc
      (Vector.empty[String], Vector("a"), 0L),
      (Vector("a", "b"), Vector.empty[String], 0L)) //  empty phrase counts 0
    val df = cases.zipWithIndex
      .map { case ((t, p, _), i) => (i, t, p) }.toDF("id", "toks", "ph")
    val got = df.select($"id",
      TextExpressions.phraseCount($"toks", $"ph").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case ((t, p, want), i) =>
      assert(got(i) == want, s"case $i: tokens=$t phrase=$p got ${got(i)} want $want")
    }
  }

  test("property: 800 random cases match the naive reference, codegen and SQL alike") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "ab") // small alphabet → dense matches
    val cases = (0 until 800).map { i =>
      val toks = Vector.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
      val ph = Vector.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, toks, ph)
    }
    val df = cases.toDF("id", "toks", "ph")
    val got = df.select($"id",
      TextExpressions.phraseCount($"toks", $"ph").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (i, t, p) =>
      assert(got(i) == naive(t, p),
        s"case $i: tokens=$t phrase=$p got ${got(i)} want ${naive(t, p)}")
    }
    // SQL surface computes identically (same expression, interpreter or
    // codegen as the planner chooses)
    df.createOrReplaceTempView("pc_cases")
    val viaSql = spark.sql("SELECT id, phrase_count(toks, ph) AS n FROM pc_cases")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == got)
  }

  test("null inputs are null, null elements never match") {
    val df = Seq(
      (1L, Vector("a", "b"), null.asInstanceOf[Vector[String]]),
      (2L, null.asInstanceOf[Vector[String]], Vector("a")))
      .toDF("id", "toks", "ph")
    val out = df.select($"id", TextExpressions.phraseCount($"toks", $"ph").as("n"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L), "null array input must yield null, not 0")
    val withNullElem = spark.sql(
      "SELECT phrase_count(array('a', CAST(NULL AS STRING), 'b'), array('a', 'b'))")
      .head.getLong(0)
    assert(withNullElem == 0L, "a null token can never participate in a match")
  }
}
