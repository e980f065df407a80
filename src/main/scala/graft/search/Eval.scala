package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: recall@k, reciprocal rank, and nDCG@k
  * per query, from a ranked hit list and a relevance table — the offline
  * eval loop every retrieval stack runs (TREC methodology; nDCG per
  * Järvelin & Kekäläinen 2002).
  *
  * Composes like [[graft.ops.Ann.majorityVote]]: input is ANY hit list
  * `(query_id, id, rank)` — exact, RP/IVF/PQ, BM25, fused — so the same
  * evaluator scores every retrieval path, and A/B-ing two paths is two
  * calls over the same truth table.
  *
  * Determinism: discounted gains are quantized to a 1e-9 integer grid
  * (`round(1e9·rel/ln(rank+1))`) before summation, so DCG/IDCG are exact
  * integer sums — associative, partition-invariant, reproducible by any
  * engine. The natural-log discount differs from the classical log₂ by a
  * constant factor that cancels in the nDCG ratio.
  *
  * Scale shape: everything is hits-sized (queries × k) or truth-sized —
  * never corpus-sized. The ideal-ranking window sorts each query's truth
  * list only.
  */
object Eval {

  /** Per-query metrics. `recall` is the capped form
    * `hits_rel / min(truth_total, k)` — a perfect top-k scores 1.0 even
    * when the truth set is larger than k (plain recall@k divides by
    * `truth_total`; derive it from the emitted counts if needed).
    *
    * @param hits  `(queryIdCol, idCol, rank)` ranked retrieval output
    * @param truth `(queryIdCol, idCol, rel)` graded relevance, rel ≥ 0;
    *              pairs absent from `truth` count as rel 0
    * @return one row per query in `truth`:
    *         `(query_id, hits_rel, truth_total, recall, first_rel_rank,
    *           rr, dcg_scaled, idcg_scaled, ndcg)` — queries whose hit
    *         list retrieved nothing relevant still appear (zeros), so
    *         aggregate metrics cannot silently drop failures
    */
  def evaluate(
      hits: DataFrame,
      truth: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      idCol: String = "vec_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // The contract accepts ANY caller hit list / truth table, so enforce
    // (query_id, id) uniqueness here rather than assuming it: a duplicated
    // hit or truth row would double-count gains and hits_rel (DCG > IDCG,
    // recall > 1). Hits keep their best (min) rank; truth keeps its max
    // grade — both deterministic aggregates, not dropDuplicates' arbitrary
    // row pick. Well-formed inputs pass through value-identical.
    val hitsU = hits
      .groupBy(col(queryIdCol), col(idCol))
      .agg(min(col("rank")).as("rank"))
    val truth0 = truth
      .groupBy(col(queryIdCol), col(idCol))
      .agg(max(col("rel")).as("rel"))
    val gain = round(lit(1e9) * col("rel").cast("double") /
      log(col("rank").cast("double") + 1.0)).cast("long")
    val hitAgg = hitsU
      .where(col("rank") <= k)
      .join(truth0, Seq(queryIdCol, idCol), "left")
      .na.fill(0L, Seq("rel"))
      .groupBy(col(queryIdCol))
      .agg(
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits_rel"),
        sum(when(col("rel") > 0, gain).otherwise(0L)).as("dcg_scaled"),
        min(when(col("rel") > 0, col("rank").cast("long"))).as("first_rel_rank"))
    // ideal ordering: the query's own truth sorted by (rel desc, id) — the
    // same discount law on ranks 1..k gives the per-query ceiling
    val idealW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("rel").desc, col(idCol))
    val idealAgg = truth0
      .where(col("rel") > 0)
      .withColumn("rank", row_number().over(idealW))
      .where(col("rank") <= k)
      .groupBy(col(queryIdCol))
      .agg(sum(gain).as("idcg_scaled"), count(lit(1)).as("ideal_k"))
    val truthAgg = truth0
      .where(col("rel") > 0)
      .groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("truth_total"))
    truthAgg
      .join(idealAgg, Seq(queryIdCol), "left")
      .join(hitAgg, Seq(queryIdCol), "left")
      .na.fill(0L, Seq("hits_rel", "dcg_scaled", "idcg_scaled"))
      .select(
        col(queryIdCol),
        col("hits_rel"),
        col("truth_total"),
        round(col("hits_rel").cast("double") /
          least(col("truth_total"), lit(k.toLong)).cast("double"), 6).as("recall"),
        coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank"),
        round(when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank").cast("double")).otherwise(0.0), 6)
          .as("rr"),
        col("dcg_scaled"),
        col("idcg_scaled"),
        round(when(col("idcg_scaled") > 0,
          col("dcg_scaled").cast("double") / col("idcg_scaled").cast("double"))
          .otherwise(0.0), 6).as("ndcg"))
  }
}
