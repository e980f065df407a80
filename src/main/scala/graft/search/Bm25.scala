package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword retrieval over an inverted-index table, plus
  * reciprocal-rank-fusion for hybrid (keyword + vector) search.
  *
  * The reference system retrieves purely by embedding similarity
  * (app.py:133-153); production RAG stacks pair that dense channel with a
  * sparse keyword channel and fuse ranks — BM25 (Robertson et al., TREC-3)
  * is the standard sparse scorer and RRF (Cormack et al., SIGIR 2009) the
  * standard fusion rule. Both are implemented as plain DataFrame algebra:
  *
  *   - The index is a TABLE (`postings(doc_id, term, tf, dl)` +
  *     `terms(term, df)`), not a service: built with two keyed shuffles,
  *     persisted as Parquet, incrementally appendable — the same
  *     "index is a DataFrame" stance as [[graft.index.VectorIndex]].
  *   - Scoring a query batch touches ONLY postings holding the queries'
  *     terms: the per-term stats for the batch are collected onto the
  *     query side and broadcast, so the big postings table never
  *     shuffles — a broadcast-hash semi-join prunes it at scan stage.
  *   - Per-(query, doc) scores are exact integer algebra: each term's
  *     partial score is quantized to a 1e-6 grid (same recipe as DSIR /
  *     the bigram LM gate), so the sum is associative and the oracle can
  *     reproduce it bit-for-bit regardless of partitioning.
  *   - Top-k per query runs through the bounded-heap aggregate
  *     ([[graft.functions.TopKByDist]]): map-side k-heaps, the shuffle
  *     carries partitions×k rows, never the full scored candidate set.
  *
  * At 100 TB the postings table is the big side; everything query-sized
  * (terms, idf, rank lists) is driver-bounded by construction: a query
  * batch of q queries with ≤t terms each contributes q·t broadcast rows.
  */
object Bm25 {

  /** Lowercase word tokens; the same closed token law the oracle reruns
    * (`[^a-z0-9]+` split on the lowercased text).
    */
  def tokensCol(text: Column): Column =
    filter(split(lower(coalesce(text, lit(""))), "[^a-z0-9]+"), t => length(t) > 0)

  /** Inverted index at rest.
    *
    * @param postings one row per (doc_id, term): raw term frequency `tf`
    *                 and the document length `dl` denormalized onto every
    *                 row (the "norms" a Lucene segment stores per doc) so
    *                 scoring needs no join back to a corpus-sized table
    * @param terms    one row per distinct term with its document frequency
    * @param nDocs    corpus document count (scalar)
    * @param avgDl    mean document length in tokens (scalar)
    */
  final case class Index(postings: DataFrame, terms: DataFrame, nDocs: Long, avgDl: Double)

  /** Build the inverted index: two keyed shuffles (docs×terms → tf, then
    * term → df) plus one scalar aggregate for (N, avgdl). The `dl` window
    * runs inside the doc_id shuffle the tf aggregate already did — Spark
    * plans tf-groupBy and the doc-partitioned window off one Exchange when
    * the window key is a prefix of the grouping key.
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Index = {
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      explode(tokensCol(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val postings = tf.withColumn(
      "dl", sum("tf").over(Window.partitionBy("doc_id")).cast("long"))
    val terms = postings.groupBy("term").agg(count(lit(1)).as("df"))
    // exactly two scalars cross the driver — bounded by construction
    val stats = postings
      .agg(count_distinct(col("doc_id")).as("n"), sum("tf").as("tot"))
      .head()
    val n = stats.getLong(0)
    Index(postings, terms, n, if (n == 0) 0.0 else stats.getLong(1).toDouble / n)
  }

  /** BM25 top-k for a query TABLE in one pass over the (term-pruned)
    * postings. `queries(query_id, query_text)`; returns
    * `(query_id, rank, doc_id, score)` with rank 1..k ordered by
    * (score desc, doc_id asc) — integer-quantized scores make the order
    * exactly reproducible.
    *
    * Each distinct query term scores once per occurrence-holding doc
    * (query-side term multiplicity is ignored, the Lucene convention).
    */
  def topKBatch(
      queries: DataFrame,
      index: Index,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    scoreTermTable(
      queries.select(
        col("query_id").cast("long"),
        explode(array_distinct(tokensCol(col("query_text")))).as("term")),
      index, k, k1, b)

  /** Score an explicit `(query_id, term)` table — the shared engine under
    * [[topKBatch]] (terms tokenized from query text) and [[topKBatchPrf]]
    * (terms expanded by feedback). Scoring law as documented on the class.
    */
  def scoreTermTable(
      qTerms: DataFrame,
      index: Index,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // idf on the query side: terms(df) is corpus-vocabulary-sized, the
    // semi-join against the tiny broadcast query-term set prunes it before
    // anything moves; result is q·t rows, re-broadcast to the postings scan
    val n = lit(index.nDocs.toDouble)
    val qIdf = index.terms
      .join(broadcast(qTerms), Seq("term"))
      .withColumn("idf_scaled",
        round(log((n - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * 1e6)
          .cast("long"))
      .select("query_id", "term", "idf_scaled")
    val tfNorm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(index.avgDl)))
    val partials = index.postings
      .join(broadcast(qIdf), Seq("term"))
      .select(
        col("query_id"), col("doc_id"),
        round(col("idf_scaled").cast("double") * tfNorm).cast("long").as("part"))
    val scored = partials
      .groupBy("query_id", "doc_id")
      .agg(sum("part").as("score_scaled"))
    scored
      .groupBy("query_id")
      .agg(call_function("topk_by_dist",
        -col("score_scaled").cast("double"), col("doc_id"), lit(k)).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r", "hit")))
      .select(
        col("query_id"),
        (col("r") + 1).cast("int").as("rank"),
        col("hit.id").as("doc_id"),
        (-col("hit.dist")).cast("long").as("score_scaled"),
        (-col("hit.dist") / 1e6).as("score"))
  }

  /** Pseudo-relevance feedback (Rocchio 1971 / RM3-lite): run the query,
    * harvest the `fbTerms` highest-mass terms from its top `fbDocs`
    * results, union them with the original terms, rescore. The classic
    * zero-supervision recall lever for sparse retrieval — vocabulary
    * mismatch ("car" vs "automobile") is bridged by whatever the first
    * pass DID find.
    *
    * Feedback mass is the summed raw tf over the feedback docs, ties to
    * the lexicographically smaller term — integers, deterministic, and
    * cheaply reproducible by the oracle. All intermediates are
    * query-batch-sized: first-pass hits (q × fbDocs), their postings
    * (fbDocs docs' worth), the expanded term table (q × (t + fbTerms)).
    */
  def topKBatchPrf(
      queries: DataFrame,
      index: Index,
      k: Int,
      fbDocs: Int = 3,
      fbTerms: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val origTerms = queries.select(
      col("query_id").cast("long"),
      explode(array_distinct(tokensCol(col("query_text")))).as("term"))
    val first = scoreTermTable(origTerms, index, fbDocs, k1, b)
      .select("query_id", "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("fb_tf").desc, col("term"))
    val fb = index.postings
      .join(broadcast(first), Seq("doc_id"))
      .groupBy("query_id", "term")
      .agg(sum("tf").as("fb_tf"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= fbTerms)
      .select("query_id", "term")
    val expanded = origTerms.unionByName(fb).distinct()
    scoreTermTable(expanded, index, k, k1, b)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): fuse any number of
    * per-query rank lists `(query_id, doc_id, rank)` into one list scored
    * by Σ 1/(rrfK + rank). The per-list contribution is computed as the
    * integer `1e9 div (rrfK + rank)` so the fused score is an exact
    * integer sum — associative, partition-invariant, oracle-reproducible.
    * Output: `(query_id, rank, doc_id, rrf_scaled)`, rank 1..k by
    * (rrf desc, doc_id asc).
    *
    * Rank lists are query-batch-sized (q·k rows each), so the union and
    * re-aggregation never touch corpus-scale data.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one rank list")
    val contribs = lists
      .map(_.select(
        col("query_id").cast("long"),
        col("doc_id").cast("long"),
        floor(lit(1000000000L) / (lit(rrfK.toLong) + col("rank").cast("long")))
          .as("contrib")))
      .reduce(_ unionByName _)
    contribs
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("rrf_scaled"))
      .groupBy("query_id")
      .agg(call_function("topk_by_dist",
        -col("rrf_scaled").cast("double"), col("doc_id"), lit(k)).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r", "hit")))
      .select(
        col("query_id"),
        (col("r") + 1).cast("int").as("rank"),
        col("hit.id").as("doc_id"),
        (-col("hit.dist")).cast("long").as("rrf_scaled"))
  }
}
