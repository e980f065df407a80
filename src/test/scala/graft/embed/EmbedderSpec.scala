package graft.embed

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The [[Embedder]] seam: two unrelated implementations, one contract.
  * Downstream operators consume only the `ARRAY<FLOAT>` column, so an
  * index built with either must flow through kNN unchanged.
  */
class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark shuffles data between stages"),
    (2L, "spark broadcasts small tables"),
    (3L, "ducks swim in the pond"),
    (4L, "the pond has many ducks swimming"),
    (5L, "catalyst optimizes the logical plan")
  ).toDF("doc_id", "chunk")

  private def vectors(df: DataFrame): Map[Long, Seq[Float]] =
    df.select("doc_id", "embedding").as[(Long, Seq[Float])].collect().toMap

  test("Word2Vec embedder is deterministic across input partitioning") {
    val a = new Word2VecEmbedder(16).fit(corpus.repartition(1), "chunk")
    val b = new Word2VecEmbedder(16).fit(corpus.repartition(7), "chunk")
    val va = vectors(a.embed(corpus, "chunk", "embedding"))
    val vb = vectors(b.embed(corpus, "chunk", "embedding"))
    assert(va == vb, "fit must not depend on the corpus partitioning")
  }

  test("Word2Vec embedder emits the declared dims and a non-degenerate space") {
    val e = new Word2VecEmbedder(16).fit(corpus, "chunk")
    val vs = vectors(e.embed(corpus, "chunk", "embedding"))
    assert(vs.values.forall(_.length == 16))
    // at least two documents must differ (an all-zeros output would pass
    // a shape-only check)
    assert(vs.values.toSeq.distinct.length > 1)
  }

  test("both embedders satisfy the seam: kNN runs on either index unchanged") {
    for (embedder <- Seq[Embedder](
        new HashingTfIdfEmbedder(16).fit(corpus, "chunk"),
        new Word2VecEmbedder(16).fit(corpus, "chunk"))) {
      val index = embedder.embed(corpus, "chunk", "embedding")
        .withColumnRenamed("doc_id", "chunk_id")
      val q = index.where(col("chunk_id") === 3)
        .select("embedding").as[Seq[Float]].head().toArray
      val top = graft.search.Knn.topK(index, q, 2).select("chunk_id")
        .as[Long].collect().toSeq
      assert(top.headOption.contains(3L),
        s"${embedder.getClass.getSimpleName}: self must be its own nearest neighbor, got $top")
    }
  }
}
