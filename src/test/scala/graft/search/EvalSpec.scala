package graft.search

import graft.SparkSpec
import org.apache.spark.sql.Row

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def gain(rank: Int): Long =
    math.round(1e9 * 1.0 / math.log(rank + 1.0))

  private def row(df: org.apache.spark.sql.DataFrame, q: Long): Row =
    df.where($"query_id" === q).head()

  test("perfect retrieval scores recall 1, rr 1, ndcg 1") {
    val hits = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "vec_id", "rank")
    val truth = Seq((0L, 10L, 1L), (0L, 11L, 1L)).toDF("query_id", "vec_id", "rel")
    val r = row(Eval.evaluate(hits, truth, k = 5), 0L)
    assert(r.getAs[Long]("hits_rel") == 2)
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Long]("first_rel_rank") == 1)
    assert(r.getAs[Double]("rr") == 1.0)
    assert(r.getAs[Long]("dcg_scaled") == gain(1) + gain(2))
    assert(r.getAs[Double]("ndcg") == 1.0)
  }

  test("query with zero relevant hits still appears, all zeros") {
    val hits = Seq((0L, 10L, 1)).toDF("query_id", "vec_id", "rank")
    val truth = Seq((0L, 99L, 1L), (1L, 98L, 1L)).toDF("query_id", "vec_id", "rel")
    val out = Eval.evaluate(hits, truth, k = 5)
    assert(out.count() == 2, "every truth query must be scored")
    val r0 = row(out, 0L)
    assert(r0.getAs[Long]("hits_rel") == 0 && r0.getAs[Double]("rr") == 0.0 &&
      r0.getAs[Double]("ndcg") == 0.0 && r0.getAs[Long]("first_rel_rank") == 0)
    val r1 = row(out, 1L) // no hit list at all for query 1
    assert(r1.getAs[Long]("hits_rel") == 0 && r1.getAs[Double]("recall") == 0.0)
  }

  test("hand-computed partial case: rel at ranks 2 and 4 of ideal 2") {
    val hits = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3), (0L, 13L, 4))
      .toDF("query_id", "vec_id", "rank")
    val truth = Seq((0L, 11L, 1L), (0L, 13L, 1L)).toDF("query_id", "vec_id", "rel")
    val r = row(Eval.evaluate(hits, truth, k = 4), 0L)
    assert(r.getAs[Long]("dcg_scaled") == gain(2) + gain(4))
    assert(r.getAs[Long]("idcg_scaled") == gain(1) + gain(2))
    assert(r.getAs[Long]("first_rel_rank") == 2)
    assert(r.getAs[Double]("rr") == 0.5)
    assert(r.getAs[Double]("ndcg") ==
      BigDecimal((gain(2) + gain(4)).toDouble / (gain(1) + gain(2)).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("recall is capped: full top-k against a larger truth set scores 1") {
    val hits = (1 to 3).map(r => (0L, 10L + r, r)).toDF("query_id", "vec_id", "rank")
    val truth = (1 to 8).map(i => (0L, 10L + i, 1L)).toDF("query_id", "vec_id", "rel")
    val r = row(Eval.evaluate(hits, truth, k = 3), 0L)
    assert(r.getAs[Long]("truth_total") == 8)
    assert(r.getAs[Double]("recall") == 1.0, "k perfect hits of 8 truths at k=3")
    // ideal is also truncated at k, so ndcg stays 1 for a perfect prefix
    assert(r.getAs[Double]("ndcg") == 1.0)
  }

  test("hits beyond k are ignored") {
    val hits = Seq((0L, 10L, 1), (0L, 11L, 7)).toDF("query_id", "vec_id", "rank")
    val truth = Seq((0L, 11L, 1L)).toDF("query_id", "vec_id", "rel")
    val r = row(Eval.evaluate(hits, truth, k = 5), 0L)
    assert(r.getAs[Long]("hits_rel") == 0, "rank-7 hit must not count at k=5")
  }

  test("duplicated hit/truth rows cannot inflate metrics past 1") {
    // the same doc listed twice in the hits (ranks 1 and 3) and its truth
    // row duplicated: without (query_id, id) dedup this double-counts
    // gains (dcg > idcg -> ndcg > 1) and hits_rel (recall > 1)
    val hits = Seq((0L, 10L, 1), (0L, 10L, 3), (0L, 11L, 2))
      .toDF("query_id", "vec_id", "rank")
    val truth = Seq((0L, 10L, 1L), (0L, 10L, 1L), (0L, 11L, 1L))
      .toDF("query_id", "vec_id", "rel")
    val r = row(Eval.evaluate(hits, truth, k = 5), 0L)
    assert(r.getAs[Long]("truth_total") == 2, "truth dedups to 2 docs")
    assert(r.getAs[Long]("hits_rel") == 2, "doc 10 counts once")
    assert(r.getAs[Double]("recall") == 1.0)
    // doc 10 keeps its BEST rank (1), so the dedup is also deterministic
    assert(r.getAs[Long]("dcg_scaled") == gain(1) + gain(2))
    assert(r.getAs[Double]("ndcg") == 1.0)
  }

  test("conflicting duplicate truth grades resolve to the max rel") {
    val hits = Seq((0L, 10L, 1)).toDF("query_id", "vec_id", "rank")
    val truth = Seq((0L, 10L, 0L), (0L, 10L, 2L)).toDF("query_id", "vec_id", "rel")
    val r = row(Eval.evaluate(hits, truth, k = 5), 0L)
    assert(r.getAs[Long]("hits_rel") == 1, "rel 2 wins over the rel-0 duplicate")
    assert(r.getAs[Double]("ndcg") == 1.0)
  }
}
