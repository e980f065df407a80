package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generation-quality evaluation — ROUGE-N (Lin 2004) over
  * (candidate, reference) text pairs: the answer-side twin of
  * [[graft.search.Eval]]'s retrieval metrics. A RAG stack that measures
  * recall@k but never scores its ANSWERS against references cannot tell
  * a retrieval regression from a generation one; batch answer eval over
  * a gold set is the standard loop (and the same clipped-count law is
  * BLEU's modified n-gram precision, so this is both metrics' core).
  *
  * Law (deterministic, SQL-replayable — `x26_rouge_eval` recomputes it
  * in DuckDB): tokens under the BM25 token law
  * ([[graft.search.Bm25.tokensCol]]); n-grams are space-joined sliding
  * windows; overlap is the MULTISET intersection — per distinct gram,
  * `min(candidate count, reference count)`, summed (the clipped-count
  * law: a candidate repeating a reference gram five times earns it once
  * per reference occurrence, Lin §2 / Papineni §2.1). Precision =
  * overlap / candidate grams, recall = overlap / reference grams,
  * F1 = 2·overlap / (candidate + reference grams) — the harmonic mean,
  * reduced; a side with no grams (short text, n > token count) scores
  * 0, never a division error, and a pair whose BOTH sides are too short
  * still emits its zero row (the Eval zero-row discipline).
  *
  * Scale shape: everything is pair-local — one explode to (pair, gram)
  * rows per side, one keyed count, one keyed sum. No corpus scan, no
  * window function, no UDF; a 1M-pair eval set is one shuffle keyed by
  * (pair, gram) and one by pair.
  */
object GenEval {

  /** Per-pair ROUGE-N:
    * `(idCol, n, cand_grams, ref_grams, overlap, precision, recall, f1)`.
    */
  def rougeN(
      pairs: DataFrame,
      n: Int,
      idCol: String = "pair_id",
      candCol: String = "candidate",
      refCol: String = "reference"): DataFrame = {
    require(n >= 1 && n <= 8, s"rougeN: n $n must be in [1, 8]")
    // pair-id uniqueness fails LOUDLY (ADVICE r12): duplicate ids would
    // merge both rows' gram multisets into one and the final distinct()
    // would emit a single plausible-but-wrong P/R/F1 row — a silent blend.
    // One aggregate action over the id column only (an eval set is
    // gold-sized, and an eval that can silently blend is worse than one
    // that pays a count).
    val ids = pairs.agg(
      count(lit(1)).as("__n"), count_distinct(col(idCol)).as("__d")).head
    require(ids.getLong(0) == ids.getLong(1),
      s"rougeN: ${ids.getLong(0) - ids.getLong(1)} duplicate $idCol value(s) " +
        "— gram counts would silently blend across rows; key each " +
        "(candidate, reference) row uniquely")
    def gramCounts(textCol: String, cntName: String) =
      pairs
        .select(col(idCol),
          graft.search.Bm25.tokensCol(col(textCol)).as("__toks"))
        .select(col(idCol), explode(
          when(size(col("__toks")) >= n,
            expr(s"transform(sequence(1, size(__toks) - ${n - 1}), " +
              s"i -> array_join(slice(__toks, i, $n), ' '))"))
            .otherwise(array())).as("__gram"))
        .groupBy(col(idCol), col("__gram"))
        .agg(count(lit(1)).as(cntName))
    val joined = gramCounts(candCol, "__c_cnt")
      .join(gramCounts(refCol, "__r_cnt"), Seq(idCol, "__gram"), "full_outer")
      .na.fill(0L, Seq("__c_cnt", "__r_cnt"))
      .groupBy(col(idCol))
      .agg(
        sum("__c_cnt").as("cand_grams"),
        sum("__r_cnt").as("ref_grams"),
        sum(least(col("__c_cnt"), col("__r_cnt"))).as("overlap"))
    pairs.select(col(idCol)).distinct()
      .join(joined, Seq(idCol), "left")
      .na.fill(0L, Seq("cand_grams", "ref_grams", "overlap"))
      .select(
        col(idCol), lit(n).as("n"),
        col("cand_grams"), col("ref_grams"), col("overlap"),
        round(when(col("cand_grams") > 0,
          col("overlap").cast("double") / col("cand_grams")).otherwise(0.0), 6)
          .as("precision"),
        round(when(col("ref_grams") > 0,
          col("overlap").cast("double") / col("ref_grams")).otherwise(0.0), 6)
          .as("recall"),
        round(when(col("cand_grams") + col("ref_grams") > 0,
          lit(2.0) * col("overlap").cast("double") /
            (col("cand_grams") + col("ref_grams"))).otherwise(0.0), 6)
          .as("f1"))
  }
}
