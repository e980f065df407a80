package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the diversity-aware sibling of the reference's
  * `similarity_search` (`/root/reference/micro-infobot/app.py:223`): the
  * LangChain/Chroma vector store the reference builds exposes exactly this
  * as `max_marginal_relevance_search(k, fetch_k, lambda_mult)`, so a
  * reference user switching engines expects it next to [[Knn.topK]].
  *
  * Semantics follow LangChain's `maximal_marginal_relevance`: fetch the
  * `fetchK` nearest candidates by the store metric (L2, the reference's
  * Chroma default), then greedily select `k` of them where each pick
  * maximizes
  *
  *   `score = lambdaMult * cos(query, cand)
  *            − (1 − lambdaMult) * max_{s ∈ selected} cos(cand, s)`
  *
  * (relevance and diversity both cosine, the LangChain formulation; the
  * max over an empty selected set is 0, so the first pick is the highest
  * `lambdaMult`-scaled relevance). Ties break toward the smaller id at
  * every stage, so the result is deterministic and DuckDB-replayable —
  * the registered `q11_mmr_rerank` oracle recomputes the whole greedy
  * selection (unrolled) in SQL rather than pinning a golden.
  *
  * Scale shape: the candidate fetch is one of the two audited kNN routes
  * ([[Knn.topKBatch]]'s bounded-heap aggregate exact path, or
  * [[graft.ops.Ann.rpTopKBatch]]'s banded path for `approx = true` — the
  * `hardNegatives` routing pattern); the greedy stage is ONE shuffle
  * keyed by query id into `flatMapGroups` over groups bounded at `fetchK`
  * rows — per-group state is O(fetchK · dim) and the selection loop
  * O(k · fetchK) cosines, both constants, so a 100 TB corpus costs
  * exactly its fetch. Candidate vectors re-join from the index by id (a
  * Q·fetchK-row build side — broadcast under AQE for bounded batches,
  * plain hash join above).
  */
object Mmr {

  /** Batch MMR: one row per (query, rank ≤ k) —
    * `(queryIdCol, rank, idCol, mmr_score)`, rank 1..k in selection
    * order. `mmr_score` is the value the pick maximized (the rank-1 score
    * is `lambdaMult · relevance`: no diversity penalty yet).
    */
  def mmrTopKBatch(
      queries: DataFrame,
      index: DataFrame,
      k: Int = 4,
      fetchK: Int = 20,
      lambdaMult: Double = 0.5,
      approx: Boolean = false,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      idCol: String = "chunk_id",
      embCol: String = "embedding",
      nTables: Int = 8,
      nProjs: Int = 3,
      width: Double = 0.5): DataFrame = {
    require(k > 0, s"mmrTopKBatch: k $k must be > 0")
    require(fetchK >= k, s"mmrTopKBatch: fetchK $fetchK must be >= k $k")
    // the greedy group materializes fetchK vectors per query — keep the
    // bound a task-local constant, not a knob that silently becomes a
    // per-query collect of the corpus
    require(fetchK <= 4096, s"mmrTopKBatch: fetchK $fetchK exceeds the " +
      "4096 per-query candidate bound — at that depth rerank the fetch " +
      "route's output directly instead")
    require(lambdaMult >= 0.0 && lambdaMult <= 1.0,
      s"mmrTopKBatch: lambdaMult $lambdaMult must be in [0, 1]")
    // the greedy stage keys groups on the query id cast to long — a
    // non-integral id would cast to null and silently collapse EVERY
    // query into one group (the topKBatch guard, applied to the query
    // side this operator actually groups on)
    val qIdType = queries.schema(queryIdCol).dataType
    require(
      qIdType == org.apache.spark.sql.types.LongType ||
        qIdType == org.apache.spark.sql.types.IntegerType,
      s"mmrTopKBatch query id column '$queryIdCol' must be integral, got $qIdType")
    val spark = index.sparkSession
    import spark.implicits._
    val cands =
      (if (approx)
        // banding knobs pass through (the hardNegatives pattern): a
        // clustered corpus under the shallow default admits bucket-sized
        // candidate sets — deep-AND (higher nProjs) is the dense-data
        // setting, exactly as on the semantic-cache route (c10b)
        graft.ops.Ann.rpTopKBatch(queries, index, fetchK,
          nTables, nProjs, width,
          queryIdCol = queryIdCol, queryVecCol = queryVecCol,
          idCol = idCol, vecCol = embCol)
      else
        Knn.topKBatch(queries, index, fetchK, queryIdCol, queryVecCol,
          idCol, embCol))
        .select(col(queryIdCol), col(idCol))
    // candidate vectors re-join from the index by id; query vectors and
    // the relevance cosine attach BEFORE the group so the codegen
    // expression scores them, and the greedy loop only computes
    // candidate-candidate cosines
    val withVecs = cands
      .join(index.select(col(idCol), col(embCol).as("__cv")), Seq(idCol))
      .join(queries.select(col(queryIdCol), col(queryVecCol).as("__qv")),
        Seq(queryIdCol))
      .select(
        col(queryIdCol).cast("long").as("qid"),
        col(idCol).cast("long").as("cid"),
        graft.functions.VectorFunctions
          .cosineSimilarity(col("__cv"), col("__qv")).as("rel"),
        col("__cv"))
      // one candidate row per (query, id): duplicate ids in the index
      // multiply rows through the vector re-join, and the greedy loop's
      // taken() is per-array-SLOT — the same id could then be selected at
      // two ranks (ADVICE r12). Unique index ids are the contract (as in
      // Knn/Ann); this dedup makes a replayed/doubled row benign — two
      // DIFFERENT vectors under one id remain a producer bug, resolved
      // arbitrarily here rather than corrupting the rank list.
      .dropDuplicates("qid", "cid")
      .as[(Long, Long, Double, Array[Float])]
    val lam = lambdaMult
    val kk = k
    val picked = withVecs
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // deterministic regardless of arrival order: (rel desc, id asc)
        val cs = it.toArray.sortBy(c => (-c._3, c._2))
        val n = cs.length
        // max cos to the selected set — the TRUE max, which can be
        // NEGATIVE (an anti-correlated pick turns the penalty into a
        // bonus, exactly as in LangChain's maximal_marginal_relevance);
        // a 0-floored running max would silently clamp it, so the first
        // pick's update assigns unconditionally
        val maxSim = new Array[Double](n)
        val taken = new Array[Boolean](n)
        val out = Array.newBuilder[(Long, Int, Long, Double)]
        var rank = 1
        while (rank <= kk && rank <= n) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var bestId = Long.MaxValue
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              // max over an empty selected set is 0 (the rank-1 law)
              val div = if (rank == 1) 0.0 else maxSim(i)
              val s = lam * cs(i)._3 - (1.0 - lam) * div
              if (s > bestScore || (s == bestScore && cs(i)._2 < bestId)) {
                best = i; bestScore = s; bestId = cs(i)._2
              }
            }
            i += 1
          }
          taken(best) = true
          out += ((qid, rank, cs(best)._2, bestScore))
          val pv = cs(best)._4
          var j = 0
          while (j < n) {
            if (!taken(j)) {
              val c = cosine(cs(j)._4, pv)
              if (rank == 1 || c > maxSim(j)) maxSim(j) = c
            }
            j += 1
          }
          rank += 1
        }
        out.result().iterator
      }
    picked.toDF("qid", "rank", "cid", "mmr_score")
      .select(col("qid").as(queryIdCol), col("rank"), col("cid").as(idCol),
        col("mmr_score"))
  }

  /** Same arithmetic as [[graft.functions.VectorFunctions]]'
    * `CosineSimilarity` (left-to-right double accumulation, 0.0 on a
    * zero norm) so in-group diversity cosines are bit-identical to the
    * codegen relevance column — and to the DuckDB oracle's `list_sum`
    * fold.
    */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    require(b.length == n, s"cosine: dims ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
