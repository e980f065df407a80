package graft.serve

import graft.search.Bm25
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-stage reranking — the cross-encoder slot of a production RAG
  * stack. The reference retrieves single-stage
  * (/root/reference/micro-infobot/app.py:130's similarity_search is the
  * final ranking); every deployed descendant of that shape adds
  * retrieve-cheap-then-rescore-expensive, because the first stage
  * (BM25 / ANN / hybrid RRF) is built to be sub-linear over the corpus
  * while the second stage may spend a model call per (query, candidate)
  * pair — affordable exactly because the candidate set is
  * query-batch-sized (q × firstK rows, never corpus-sized).
  *
  * The trait is the model boundary, same stance as
  * [[graft.embed.Embedder]] / [[Answerer]]:
  *  - [[OverlapReranker]] — deterministic in-repo scorer (distinct
  *    query-token overlap, a plain integer both engines reproduce), so
  *    the WHOLE rerank flow is DuckDB-hash-oracled (`b9`);
  *  - [[HttpReranker]] — bounded-batch POSTs to a rerank service (the
  *    published `POST /rerank` contract: `{"model", "query",
  *    "documents": [...]}` → `{"results": [{"index",
  *    "relevance_score"}]}`), the [[graft.embed.HttpEmbedder]] seam for
  *    real cross-encoders.
  */
trait Reranker {
  /** Adds `rr_score` (LONG, higher = more relevant, deterministic) to
    * each (query text, candidate text) pair row.
    */
  def score(pairs: DataFrame, queryTextCol: String, textCol: String): DataFrame
}

/** Distinct-token-overlap scorer: `rr_score` = how many DISTINCT query
  * tokens ([[Bm25.tokensCol]] law) appear in the candidate — the
  * lexical-evidence baseline (a unigram cross-encoder), zero model
  * state, scan-stage column algebra.
  */
object OverlapReranker extends Reranker {
  override def score(
      pairs: DataFrame, queryTextCol: String, textCol: String): DataFrame =
    pairs.withColumn("rr_score",
      size(array_intersect(
        array_distinct(Bm25.tokensCol(col(queryTextCol))),
        array_distinct(Bm25.tokensCol(col(textCol)))))
        .cast("long"))
}

/** Remote cross-encoder scorer. One POST per bounded batch of pairs
  * sharing a query (requests sequential within a partition — total
  * concurrency = partition count, the [[graft.embed.HttpEmbedder]]
  * contract); float relevance is quantized to the 1e-6 integer grid so
  * downstream ordering is exact. Responses match back by `index`; a
  * missing index fails the task loudly.
  */
class HttpReranker(
    val target: graft.http.HttpTarget,
    val model: String,
    val batchSize: Int = 32,
    val minIntervalMs: Long = 0L) extends Reranker {
  require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")

  override def score(
      pairs: DataFrame, queryTextCol: String, textCol: String): DataFrame = {
    val outSchema = pairs.schema.add("rr_score", org.apache.spark.sql.types.LongType)
    val qIdx = pairs.schema.fieldIndex(queryTextCol)
    val tIdx = pairs.schema.fieldIndex(textCol)
    val (t, m, bs, interval) = (target, model, batchSize, minIntervalMs)
    pairs.mapPartitions { rows =>
      val pacer = new graft.http.HttpCall.Pacer(interval)
      rows.grouped(bs).flatMap { batch =>
        pacer.pace()
        // one request per distinct query in the batch (the API contract
        // scores one query against many documents)
        val byQuery = batch.zipWithIndex.groupBy { case (r, _) =>
          Option(r.getString(qIdx)).getOrElse("")
        }
        val scores = new Array[Long](batch.size)
        byQuery.foreach { case (q, members) =>
          val docs = members.map { case (r, _) =>
            Option(r.getString(tIdx)).getOrElse("")
          }
          val rel = HttpReranker.requestScores(t, m, q, docs)
          members.lazyZip(rel).foreach { case ((_, i), s) => scores(i) = s }
        }
        batch.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ scores(i))
        }
      }
    }(Encoders.row(outSchema))
  }
}

object HttpReranker {
  import com.fasterxml.jackson.databind.ObjectMapper

  /** One POST scoring `docs` against `query`; 1e-6-grid integers in
    * input order.
    */
  private[serve] def requestScores(
      target: graft.http.HttpTarget,
      model: String,
      query: String,
      docs: Seq[String]): Seq[Long] = {
    val om = new ObjectMapper()
    val root = om.createObjectNode()
    root.put("model", model)
    root.put("query", query)
    val arr = root.putArray("documents")
    docs.foreach(arr.add)
    val resp = om.readTree(
      graft.http.HttpCall.postJson(target, om.writeValueAsString(root)))
    val results = resp.get("results")
    require(results != null && results.isArray && results.size() == docs.size,
      s"rerank response carries ${if (results == null) "no" else results.size()} " +
        s"rows for ${docs.size} documents")
    val out = new Array[Long](docs.size)
    val seen = new Array[Boolean](docs.size)
    results.forEach { item =>
      val idx = item.get("index").asInt()
      require(idx >= 0 && idx < docs.size && !seen(idx),
        s"rerank response index $idx out of range or duplicated")
      seen(idx) = true
      out(idx) = math.round(item.get("relevance_score").asDouble() * 1e6)
    }
    require(seen.forall(identity), "rerank response missing indexes")
    out.toSeq
  }
}

object Reranker {
  /** First-stage hits → rescored top-`k`: joins query and candidate
    * texts onto `(query_id, doc_id, rank)` hits, scores through the
    * given [[Reranker]], and keeps rank 1..k by **(rr_score desc,
    * first-stage rank asc, doc_id asc)** — the deterministic tie law
    * whatever the scorer. Everything here is query-batch-sized: the
    * queries side broadcasts, the candidate join touches q × firstK
    * docs, and the window partitions carry ≤ firstK rows each (the
    * WindowTopKRewrite turns the rank-filter into a k-heap when it
    * fires).
    */
  def rerankTopK(
      hits: DataFrame,
      queries: DataFrame,
      docs: DataFrame,
      scorer: Reranker,
      k: Int,
      queryTextCol: String = "query_text",
      textCol: String = "text"): DataFrame = {
    val pairs = hits.select("query_id", "doc_id", "rank")
      .join(broadcast(queries.select(col("query_id"), col(queryTextCol))), "query_id")
      .join(docs.select(col("doc_id"), col(textCol)), "doc_id")
    val scored = scorer.score(pairs, queryTextCol, textCol)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rr_score").desc, col("rank"), col("doc_id"))
    scored
      .withColumn("__rr", row_number().over(w))
      .where(col("__rr") <= k)
      .select(col("query_id"), col("__rr").cast("int").as("rank"),
        col("doc_id"), col("rr_score"))
  }
}
