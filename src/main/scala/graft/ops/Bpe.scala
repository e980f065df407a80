package graft.ops

import graft.transform.BpeTokenizer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark wiring for the BPE tokenizer: distributed word-frequency
  * extraction, driver-side merge training over the (bounded,
  * vocabulary-sized) frequency table, and distributed encode.
  *
  * This is the shape every production tokenizer trainer uses (HuggingFace
  * `tokenizers`, SentencePiece): the corpus pass produces a word→count
  * table — ONE shuffle, output bounded by `maxWords` — and the merge loop
  * runs over that table, never over the corpus. At 100 TB the corpus pass
  * is the only distributed stage; a capped frequency table (the standard
  * practice — rare words can't win a merge anyway) keeps the driver work
  * independent of corpus size. Encoding broadcasts the KB-sized merge
  * table inside the UDF closure and is embarrassingly parallel.
  *
  * Upgrades `TextAnalytics.tokenCount`'s whitespace proxy to real
  * learned-subword counts — feed [[tokenCountCol]] into
  * [[TrainingData.concatPack]]/[[TrainingData.shardManifest]] for packing
  * budgets measured in actual model tokens.
  */
object Bpe {

  /** Corpus word-frequency table, capped to the `maxWords` most frequent
    * (ties broken lexicographically — deterministic). One shuffle on the
    * word; the cap is a TakeOrdered (map-side heaps), never a full sort.
    */
  def wordFreqs(
      docs: DataFrame,
      textCol: String = "text",
      maxWords: Int = 65536): Array[(String, Long)] = {
    require(maxWords > 0, "Bpe.wordFreqs: maxWords must be positive")
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
  }

  /** Train a merge table from the corpus: distributed frequency pass +
    * driver-side [[BpeTokenizer.train]]. Deterministic end to end.
    */
  def train(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      maxWords: Int = 65536,
      minFrequency: Long = 2L): BpeTokenizer.Model =
    BpeTokenizer.train(wordFreqs(docs, textCol, maxWords), numMerges, minFrequency)

  /** Subword tokens for a text column. The model rides the UDF closure
    * (merge tables are KBs — broadcast-by-closure is the right size class).
    */
  def tokensCol(model: BpeTokenizer.Model)(text: Column): Column = {
    val enc = udf { t: String =>
      if (t == null) Seq.empty[String] else model.encode(t)
    }
    enc(text)
  }

  /** Learned-subword token count — drop-in for
    * `TextAnalytics.tokenCount` where the budget must be model tokens.
    */
  def tokenCountCol(model: BpeTokenizer.Model)(text: Column): Column =
    size(tokensCol(model)(text)).cast("long")

  /** Tokenize a corpus: adds `tokens` (array<string>) and `n_tokens`. */
  def tokenize(
      docs: DataFrame,
      model: BpeTokenizer.Model,
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("tokens", tokensCol(model)(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
}
