package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword-in-context snippet generation — the serving step between a
  * ranked hit list and a human: every search UI shows WHY a document
  * matched. The reference shows whole chunks (app.py:224, 300-312); at
  * corpus scale documents are pages, not chunks, and shipping full text
  * to a results page is a bandwidth bug.
  *
  * Law (deterministic, SQL-replayable — `b12_snippets` recomputes it in
  * DuckDB): query text tokenizes under the BM25 token law
  * ([[Bm25.tokensCol]]: lowercase, `[^a-z0-9]+` split, distinct); the
  * anchor is the query term with the SMALLEST first occurrence in the
  * lowercased document (substring match; ties on position break to the
  * lexicographically smaller term); the snippet is
  * `substr(text, max(1, pos − window), 2·window + len(term))` — the
  * original casing, centered on the anchor. A hit none of whose terms
  * occur (a vector-route hit, a stemmed-away keyword) still emits: null
  * anchor, position 0, the document HEAD as the snippet — result rows
  * must never vanish at the presentation step. The same law covers a hit
  * whose doc id is MISSING from the docs frame (a takedown racing the
  * search): the row emits with a null snippet, never disappears.
  *
  * Scale shape: terms explode per query (queries × |terms|, tiny), join
  * the HIT LIST (queries × k — never the corpus), fetch each hit's text
  * once by id, and `locate` runs codegen inside the scan stage; the
  * argmin is one hits-sized min-of-struct aggregate. No corpus scan
  * beyond the id-keyed text fetch, no window function, no UDF.
  */
object Snippets {

  def snippets(
      hits: DataFrame,
      docs: DataFrame,
      queries: DataFrame,
      window: Int = 40,
      queryIdCol: String = "query_id",
      queryTextCol: String = "query_text",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window > 0, s"snippets: window $window must be > 0")
    val terms = queries.select(
      col(queryIdCol),
      explode(array_distinct(Bm25.tokensCol(col(queryTextCol)))).as("__term"))
    // LEFT join: a hit whose doc id is absent from the docs frame (a
    // takedown raced the search, a stale index entry) must still emit its
    // row — null snippet, not a vanished result (ADVICE r12; the same law
    // as the no-matching-term case below)
    val withText = hits.select(col(queryIdCol), col(idCol))
      .join(docs.select(col(idCol), col(textCol).as("__text")), Seq(idCol), "left")
    val located = withText
      .join(terms, Seq(queryIdCol))
      // functions.locate only takes a literal needle; the SQL builtin
      // accepts a column (both codegen to the same StringLocate)
      .withColumn("__pos",
        call_function("locate", col("__term"), lower(col("__text"))))
      .where(col("__pos") > 0)
      // argmin by (pos asc, term asc): struct comparison is lexicographic
      .groupBy(col(queryIdCol), col(idCol))
      .agg(min(struct(col("__pos"), col("__term"))).as("__best"))
      .select(col(queryIdCol), col(idCol),
        col("__best.__pos").as("__pos"), col("__best.__term").as("__term"))
    withText
      .join(located, Seq(queryIdCol, idCol), "left")
      .select(
        col(queryIdCol), col(idCol),
        col("__term").as("matched_term"),
        coalesce(col("__pos"), lit(0)).as("match_pos"),
        when(col("__pos").isNotNull,
          col("__text").substr(
            greatest(lit(1), col("__pos") - window),
            lit(2 * window) + length(col("__term"))))
          .otherwise(substring(col("__text"), 1, 2 * window))
          .as("snippet"))
  }
}
