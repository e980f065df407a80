package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-level semantics of the analytics operators that no DuckDB
  * oracle can recompute (deflate); the SQL-expressible ones are oracled
  * via the x* queries instead.
  */
class TextAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("compressionRatio separates boilerplate from prose from noise") {
    val docs = Seq(
      (1L, "spam spam spam spam " * 50),                       // repetitive
      (2L, "The quarterly report outlines revenue growth across " +
        "three regions, with supply-chain costs partially offsetting " +
        "gains in the enterprise segment during the second half."),
      (3L, new scala.util.Random(7).alphanumeric.take(400).mkString), // noise
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = docs.select($"doc_id", TextAnalytics.compressionRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) < 0.1, s"mass repetition must compress hard, got ${r(1L)}")
    assert(r(2L) > r(1L) * 3, s"prose ${r(2L)} must sit well above boilerplate ${r(1L)}")
    assert(r(3L) > r(2L), s"alnum noise ${r(3L)} must exceed prose ${r(2L)}")
    assert(r(4L) == 1.0 && r(5L) == 1.0, "empty/null are neutral, not droppable")
    // deterministic across evaluations (fixed level/strategy)
    val again = docs.select($"doc_id", TextAnalytics.compressionRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(again == r)
  }

  test("curate's compression gate drops boilerplate, keeps prose, default is off") {
    val prose = "The quarterly report outlines revenue growth across " +
      "three regions with costs partially offsetting enterprise gains. " * 6
    val docs = Seq(
      (1L, "spam spam spam spam " * 60),  // repetitive boilerplate
      (2L, prose),
      (3L, prose + " second variant closes differently."))
      .toDF("doc_id", "text")
    val gated = CorpusPipeline.curate(docs, minQuality = 0.1, nearDupMinSim = 0.99,
      maxDocFreq = 1000L, minCompressionRatio = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(!gated.contains(1L), "boilerplate must fall to the compression gate")
    assert(gated.contains(2L), "prose must survive")
    val off = CorpusPipeline.curate(docs, minQuality = 0.1, nearDupMinSim = 0.99,
      maxDocFreq = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(off.contains(1L), "gate off by default: boilerplate passes this stage")
  }
}
