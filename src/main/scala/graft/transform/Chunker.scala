package graft.transform

import graft.functions.RecursiveSplitGenerator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed wrapper for [[RecursiveSplitter]]: splits each section's
  * content into overlapping chunks and tags them (reference semantics at
  * `/root/reference/micro-infobot/app.py:116-128`: split per section content,
  * then wrap each chunk with its section as metadata).
  *
  * Default path is the native Catalyst generator
  * ([[graft.functions.RecursiveSplitGenerator]]): chunk rows stream out of
  * the scan stage with no UDF boxing and no intermediate array value.
  * [[chunkUdf]] keeps the UDF+posexplode formulation as the parity twin.
  * Either way this is per-row work with no shuffle; one section's chunks
  * are bounded by the section length, so executor memory is safe at any
  * corpus scale.
  */
object Chunker {

  val splitUdf = udf { (content: String, size: Int, overlap: Int) =>
    if (content == null) Seq.empty[String]
    else RecursiveSplitter.split(content, size, overlap)
  }

  /** sections(doc_id, pos, section, paragraph) ->
    * (doc_id, pos, section, chunk_idx, chunk). `chunk_idx` is per (doc, pos).
    */
  def chunk(
      sections: DataFrame,
      contentCol: String = "paragraph",
      chunkSize: Int = RecursiveSplitter.DefaultChunkSize,
      chunkOverlap: Int = RecursiveSplitter.DefaultChunkOverlap): DataFrame = {
    RecursiveSplitGenerator.register(sections.sparkSession)
    sections
      .selectExpr(
        "doc_id", "pos", "section",
        s"recursive_split($contentCol, $chunkSize, $chunkOverlap) AS (chunk_idx, chunk)")
      .select(
        col("doc_id"),
        col("pos"),
        col("section"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"))
  }

  /** UDF + posexplode formulation — kept as the testing twin of [[chunk]]. */
  def chunkUdf(
      sections: DataFrame,
      contentCol: String = "paragraph",
      chunkSize: Int = RecursiveSplitter.DefaultChunkSize,
      chunkOverlap: Int = RecursiveSplitter.DefaultChunkOverlap): DataFrame = {
    sections
      .withColumn(
        "chunks",
        splitUdf(col(contentCol), lit(chunkSize), lit(chunkOverlap)))
      .select(
        col("doc_id"),
        col("pos"),
        col("section"),
        posexplode(col("chunks")).as(Seq("chunk_idx", "chunk")))
      .select(
        col("doc_id"),
        col("pos"),
        col("section"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"))
  }
}
