package graft.index

import graft.embed.HashingTfIdfEmbedder
import graft.transform.{Chunker, Sectionizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The "knowledge base": a persisted table of
  * `(chunk_id, doc_id, section, text, embedding ARRAY<FLOAT>)`.
  *
  * The reference's index build is `Chroma.from_documents(documents,
  * embeddings)` (`/root/reference/micro-infobot/app.py:130`) — an in-memory,
  * per-session store. Here the index *is* a DataFrame job: sectionize →
  * chunk → embed → write Parquet partitioned by `section`, so filtered
  * searches (app.py:150) become partition pruning at the scan, and the index
  * survives across jobs. Empty input produces an empty table, so downstream
  * searches return 0 rows — the same observable behavior as the reference's
  * `None` guard (app.py:139-140, 221-222).
  */
object VectorIndex {

  /** Full EP1 pipeline: docs(doc_id, text) -> index rows.
    *
    * Chunks are persisted (memory, spill-to-disk) because TF-IDF is
    * inherently two-pass — IDF statistics then embedding — and recomputing
    * sectionize+split for the second pass doubles the pipeline cost. The
    * cache lives until the session ends (the returned frame is lazy, so
    * there is no safe unpersist point inside build); callers building many
    * indexes in one session should `spark.catalog.clearCache()` between
    * builds.
    */
  def build(docs: DataFrame, dims: Int = 64): DataFrame = {
    val sections = Sectionizer.sectionize(docs)
    val chunks = Chunker.chunk(sections)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val embedder = new HashingTfIdfEmbedder(dims).fit(chunks, "chunk")
    embedder
      .embed(chunks, "chunk", "embedding")
      .select(
        // Stable surrogate id derived from the full (doc, pos, chunk) triple —
        // xxhash64 has no range assumptions (a long PDF can exceed 1000
        // paragraphs) and no partition-layout dependence like
        // monotonically_increasing_id.
        xxhash64(col("doc_id"), col("pos"), col("chunk_idx")).as("chunk_id"),
        col("doc_id"),
        col("section"),
        col("chunk").as("text"),
        col("embedding"))
  }

  def write(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("section").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
