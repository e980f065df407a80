package graft.embed

import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, RegexTokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable embedding stage.
  *
  * The reference embeds chunks with a remote OpenAI model
  * (`/root/reference/micro-infobot/app.py:122`, text-embedding-ada-002,
  * 1536-d). That is an external-call boundary, so the engine keeps the stage
  * behind this trait; the default implementation is a fully deterministic,
  * offline MLlib pipeline (RegexTokenizer → HashingTF → IDF) producing
  * `ARRAY<FLOAT>` — same column shape as the 64-d fixture embeddings, so the
  * search operators are embedder-agnostic.
  *
  * Scale: HashingTF is stateless (pure hashing, no vocabulary broadcast);
  * IDF.fit is one treeAggregate over the corpus and the model broadcast is
  * `numFeatures` doubles — both scale to arbitrary corpus size.
  */
trait Embedder extends Serializable {
  def dims: Int

  /** Adds `outCol: ARRAY<FLOAT>` computed from `textCol`. */
  def embed(df: DataFrame, textCol: String = "chunk", outCol: String = "embedding"): DataFrame
}

/** Deterministic TF-IDF embedder. `fit` once on the corpus, reuse for queries. */
class HashingTfIdfEmbedder(val dims: Int = 64, idfModel: Option[IDFModel] = None)
    extends Embedder {

  private def tokenizer(inputCol: String) = new RegexTokenizer()
    .setInputCol(inputCol)
    .setOutputCol("__tokens")
    .setPattern("\\s+")
    .setToLowercase(true)

  private def hashingTF = new HashingTF()
    .setInputCol("__tokens")
    .setOutputCol("__tf")
    .setNumFeatures(dims)

  /** Fit the IDF statistics on a corpus; returns an embedder that reuses them
    * (required so query-time embeddings live in the same space as the index).
    */
  def fit(corpus: DataFrame, textCol: String = "chunk"): HashingTfIdfEmbedder = {
    val tf = hashingTF.transform(tokenizer(textCol).transform(corpus))
    val model = new IDF().setInputCol("__tf").setOutputCol("__idf").fit(tf)
    new HashingTfIdfEmbedder(dims, Some(model))
  }

  private val toFloatArray = udf { v: Vector => v.toArray.map(_.toFloat) }

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val model = idfModel.getOrElse(
      throw new IllegalStateException("call fit(corpus) before embed"))
    val tf = hashingTF.transform(tokenizer(textCol).transform(df))
    model
      .transform(tf)
      .withColumn(outCol, toFloatArray(col("__idf")))
      .drop("__tokens", "__tf", "__idf")
  }
}
