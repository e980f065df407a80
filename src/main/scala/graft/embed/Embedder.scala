package graft.embed

import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, RegexTokenizer, Word2Vec, Word2VecModel}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable embedding stage.
  *
  * The reference embeds chunks with a remote OpenAI model
  * (`/root/reference/micro-infobot/app.py:122`, text-embedding-ada-002,
  * 1536-d). That is an external-call boundary, so the engine keeps the stage
  * behind this trait; [[HttpEmbedder]] is the remote-API binding (batched
  * `mapPartitions` POSTs), and the default implementation is a fully
  * deterministic, offline MLlib pipeline (RegexTokenizer → HashingTF → IDF)
  * producing
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

/** Seeded Word2Vec embedder — the second implementation behind [[Embedder]],
  * proving the seam: downstream operators (index build, kNN, ANN) never know
  * which embedder produced the `ARRAY<FLOAT>` column.
  *
  * Determinism: fixed seed, ONE training partition, corpus sorted before
  * fit — Word2Vec's SGD visits rows in partition order, so both row order
  * and partitioning must be pinned for bit-reproducible vectors across
  * differently-parallel sessions. At real scale you trade this determinism
  * back for throughput by raising `numPartitions` (Hogwild-style updates
  * make the fit order-dependent again); the *transform* side is stateless
  * either way and scales freely.
  */
class Word2VecEmbedder(val dims: Int = 64, model: Option[Word2VecModel] = None)
    extends Embedder {

  private def tokenizer(inputCol: String) = new RegexTokenizer()
    .setInputCol(inputCol)
    .setOutputCol("__tokens")
    .setPattern("\\s+")
    .setToLowercase(true)

  def fit(corpus: DataFrame, textCol: String = "chunk"): Word2VecEmbedder = {
    // The SGD pass needs ONE partition in a globally fixed order. A naive
    // sort.coalesce(1) pipelines the coalesce into the sort stage and the
    // sort itself runs as a single task; materializing the sorted result
    // first (localCheckpoint) keeps the sort parallel, and the subsequent
    // coalesce(1) concatenates the range-partitioned output in partition
    // order — still globally sorted. Rows tying on textCol are byte-equal
    // strings, so their relative order cannot change the token sequence.
    // The 1-partition FIT remains inherently serial and size-bound — that
    // is the determinism trade; raise numPartitions to trade it back for
    // throughput (Hogwild updates make the fit order-dependent again).
    val pinned = corpus.select(textCol).sort(textCol).localCheckpoint(true).coalesce(1)
    val toks = tokenizer(textCol).transform(pinned)
    val w2v = new Word2Vec()
      .setInputCol("__tokens").setOutputCol("__vec")
      .setVectorSize(dims).setSeed(42L)
      .setMinCount(1).setMaxIter(1).setNumPartitions(1)
    new Word2VecEmbedder(dims, Some(w2v.fit(toks)))
  }

  private val toFloatArray = udf { v: Vector => v.toArray.map(_.toFloat) }

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val m = model.getOrElse(
      throw new IllegalStateException("call fit(corpus) before embed"))
    m.transform(tokenizer(textCol).transform(df))
      .withColumn(outCol, toFloatArray(col("__vec")))
      .drop("__tokens", "__vec")
  }
}
