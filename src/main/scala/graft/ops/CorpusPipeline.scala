package graft.ops

import graft.index.VectorIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline (builder brief): raw
  * docs → quality filter → exact dedup → near-dup drop → chunk/embed/index.
  *
  * Each stage is one of the already-audited operators; the composition
  * keeps their scale shapes (per-row scoring in the scan, one hash shuffle
  * for exact dedup, inverted-index join for near-dups, generator chunking).
  */
object CorpusPipeline {

  /** Curate a corpus: returns the surviving docs. */
  def curate(
      docs: DataFrame,
      minQuality: Double = 0.5,
      nearDupMinSim: Double = 0.8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val quality = docs.where(TextAnalytics.qualityScore(col(textCol)) >= minQuality)
    val exact = Dedup.dedupExact(quality, idCol, textCol)
    val pairs = Dedup.jaccardPairs(exact, idCol, textCol, nearDupMinSim)
    Dedup.dropNearDups(exact, pairs, idCol)
  }

  /** Per-stage survivor counts — the curation funnel report. */
  def funnel(
      docs: DataFrame,
      minQuality: Double = 0.5,
      nearDupMinSim: Double = 0.8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val quality = docs.where(TextAnalytics.qualityScore(col(textCol)) >= minQuality)
    val exact = Dedup.dedupExact(quality, idCol, textCol)
    val pairs = Dedup.jaccardPairs(exact, idCol, textCol, nearDupMinSim)
    val near = Dedup.dropNearDups(exact, pairs, idCol)
    Seq((docs.count(), quality.count(), exact.count(), near.count()))
      .toDF("n_input", "n_quality", "n_exact", "n_near")
  }

  /** Full pipeline: curate then build the vector index. */
  def curateAndIndex(
      docs: DataFrame,
      minQuality: Double = 0.5,
      nearDupMinSim: Double = 0.8): DataFrame =
    VectorIndex.build(curate(docs, minQuality, nearDupMinSim))
}
