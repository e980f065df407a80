package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // separable corpus: punctuated prose vs keyboard-mash spam
  private lazy val labeled = {
    val good = (0L until 30L).map(i =>
      (i, s"This is a well formed sentence number $i about data pipelines. " +
        "It has punctuation, varied words, and a reasonable length.", 1.0))
    val bad = (100L until 130L).map(i =>
      (i, s"zzz qqq xxx ${"spam " * 10} zzz qqq xxx $i", 0.0))
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("classifier separates prose from spam on held-out docs") {
    val model = QualityModel.fit(labeled)
    // held-out docs from the same DISTRIBUTIONS (unseen combinations of
    // in-vocabulary words — a linear bag-of-words model generalizes over
    // shared vocabulary, not over unseen words)
    val holdout = Seq(
      (900L, "This is a well formed sentence about pipelines and data. " +
        "It has varied words, punctuation, and a reasonable length."),
      (901L, "qqq zzz spam spam spam spam xxx zzz")).toDF("doc_id", "text")
    val scored = QualityModel.score(holdout, model)
      .select("doc_id", "quality_prob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(900L) > 0.9, s"prose scored ${scored(900L)}")
    assert(scored(901L) < 0.1, s"spam scored ${scored(901L)}")
    assert(scored.values.forall(p => p >= 0 && p <= 1))
  }

  test("weakLabels: heuristic bootstrap thresholds the hand-rule score") {
    // the heuristic's length term saturates at 500 chars — the positive
    // example must be genuinely paragraph-sized
    val prose = ("A solid paragraph of real prose that keeps going with " +
      "more sentences, normal punctuation, and ordinary words. ") * 5
    val docs = Seq((0L, prose), (1L, "x")).toDF("doc_id", "text")
    val l = QualityModel.weakLabels(docs).select("doc_id", "label").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(l(0L) == 1.0 && l(1L) == 0.0)
  }

  test("fit is deterministic; scoring is scan-stage (no shuffle)") {
    val m1 = QualityModel.fit(labeled)
    val m2 = QualityModel.fit(labeled)
    assert(m1.coefficients == m2.coefficients && m1.intercept == m2.intercept)
    val plan = QualityModel.score(labeled.drop("label"), m1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring must be a pure projection:\n${plan.take(1500)}")
  }
}
