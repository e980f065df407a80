package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed wrapper for [[RecursiveSplitter]]: splits each section's
  * content into overlapping chunks and tags them (reference semantics at
  * `/root/reference/micro-infobot/app.py:116-128`: split per section content,
  * then wrap each chunk with its section as metadata).
  *
  * The splitter runs as a deterministic Scala UDF returning `ARRAY<STRING>`
  * followed by `posexplode` — per-row work with no shuffle; the array for one
  * section is bounded by the section length, so executor memory is safe at
  * any corpus scale.
  */
object Chunker {

  val splitUdf = udf { (content: String, size: Int, overlap: Int) =>
    if (content == null) Seq.empty[String]
    else RecursiveSplitter.split(content, size, overlap)
  }

  /** sections(doc_id, pos, section, paragraph) ->
    * (doc_id, section, chunk_idx, chunk). `chunk_idx` is per (doc, pos).
    */
  def chunk(
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
