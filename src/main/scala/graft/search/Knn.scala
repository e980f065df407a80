package graft.search

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Brute-force exact kNN over an embedding column — the correctness baseline
  * for the reference's similarity searches
  * (`/root/reference/micro-infobot/app.py:223,312,150,133-153`; Chroma
  * default metric = L2 distance, lower is closer).
  *
  * Plan shape and why it scales:
  *  - single query: the query vector is a literal (broadcast by value);
  *    scoring is a codegen'd expression inside the scan stage;
  *    `ORDER BY dist LIMIT k` compiles to `TakeOrderedAndProject` — each
  *    partition keeps a k-heap, the driver merges P×k rows. No full sort,
  *    no shuffle of the index.
  *  - query batch: `broadcast(queries)` cross join (index never moves),
  *    per-query top-k via window rank. One shuffle on `query_id`.
  *  - the approximate scale paths (LSH bucketing, IVF) live in
  *    [[graft.ops.Ann]]; near-duplicate detection in [[graft.ops.Dedup]].
  */
object Knn {

  /** Ties broken by chunk id so results are deterministic. */
  def topKWithScore(
      index: DataFrame,
      queryVec: Array[Float],
      k: Int,
      idCol: String = "chunk_id",
      embCol: String = "embedding"): DataFrame = {
    val dist = l2Distance(col(embCol), typedlit(queryVec)).as("dist")
    index
      .withColumn("dist", dist)
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Reference `similarity_search` (no scores, k=4 default, app.py:223). */
  def topK(
      index: DataFrame,
      queryVec: Array[Float],
      k: Int = 4,
      idCol: String = "chunk_id",
      embCol: String = "embedding"): DataFrame =
    topKWithScore(index, queryVec, k, idCol, embCol).drop("dist")

  /** Reference filtered search (app.py:150): the predicate is applied before
    * scoring, so Catalyst pushes it into the scan (partition pruning when the
    * index is partitioned by the filter column).
    */
  def topKFiltered(
      index: DataFrame,
      queryVec: Array[Float],
      k: Int,
      predicate: Column,
      idCol: String = "chunk_id",
      embCol: String = "embedding"): DataFrame =
    topKWithScore(index.where(predicate), queryVec, k, idCol, embCol)

  /** Batch kNN: one row per (query, neighbor rank ≤ k). Queries are
    * broadcast so the index never shuffles for the join; the per-query
    * top-k runs through [[graft.functions.TopKByDist]], a bounded-heap
    * aggregate with map-side partial aggregation — the shuffle carries
    * partitions×k candidate rows per query, not the whole scored index.
    */
  def topKBatch(
      queries: DataFrame,
      index: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      idCol: String = "chunk_id",
      embCol: String = "embedding"): DataFrame = {
    // ids must be integral: a blind cast("long") would turn e.g. string
    // ids into nulls the heap silently drops
    val idType = index.schema(idCol).dataType
    require(
      idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType,
      s"topKBatch id column '$idCol' must be integral, got $idType")
    val scored = index
      .crossJoin(broadcast(queries))
      .withColumn("dist", l2Distance(col(embCol), col(queryVecCol)))
    scored
      .groupBy(col(queryIdCol))
      .agg(call_function("topk_by_dist",
        col("dist"), col(idCol).cast("long"), lit(k)).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")).as(Seq("r", "hit")))
      .select(
        col(queryIdCol),
        (col("r") + 1).cast("int").as("rank"),
        col("hit.id").as(idCol),
        col("hit.dist").as("dist"))
  }

  /** Window-rank formulation of [[topKBatch]] — correct but shuffles and
    * sorts every scored row per query; kept as the parity/testing twin of
    * the aggregate path (they must return identical rows).
    */
  def topKBatchWindow(
      queries: DataFrame,
      index: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      idCol: String = "chunk_id",
      embCol: String = "embedding"): DataFrame = {
    val scored = index
      .crossJoin(broadcast(queries))
      .withColumn("dist", l2Distance(col(embCol), col(queryVecCol)))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Reference two-phase hierarchical search (app.py:133-153): coarse top-3
    * over everything, take the distinct sections of the hits, then top-2
    * *per* section within those sections.
    */
  def hierarchical(
      index: DataFrame,
      queryVec: Array[Float],
      coarseK: Int = 3,
      fineK: Int = 2,
      sectionCol: String = "section",
      idCol: String = "chunk_id",
      embCol: String = "embedding"): DataFrame = {
    val sections = topKWithScore(index, queryVec, coarseK, idCol, embCol)
      .select(sectionCol).distinct()
    val restricted = index.join(broadcast(sections), Seq(sectionCol), "left_semi")
    val w = Window.partitionBy(col(sectionCol)).orderBy(col("dist"), col(idCol))
    restricted
      .withColumn("dist", l2Distance(col(embCol), typedlit(queryVec)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= fineK)
  }

  /** Reference "importance %" normalization (app.py:317-321): each score as a
    * share of the sum of the k scores. (Scores are distances, so the least
    * similar hit gets the largest share — reference quirk, preserved.)
    */
  def normalizeScores(
      hits: DataFrame,
      scoreCol: String = "dist",
      partitionCols: Seq[String] = Nil): DataFrame = {
    // Per-result-set normalization (app.py:317-321 runs on one query's k
    // hits). For batch output pass the query-id column, so the window
    // shuffles on query_id instead of collapsing to one partition.
    val w =
      if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    hits.withColumn("importance_pct", col(scoreCol) / sum(col(scoreCol)).over(w) * 100)
  }
}
