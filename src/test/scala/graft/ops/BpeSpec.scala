package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat sat on the hat"),
    (2L, "the bat sat on the mat today"),
    (3L, "")).toDF("doc_id", "text")

  test("wordFreqs: exact counts, deterministic cap order") {
    val f = Bpe.wordFreqs(docs).toMap
    assert(f("the") == 6L && f("sat") == 3L && f("mat") == 2L && f("today") == 1L)
    // cap keeps the most frequent, ties lexicographic
    val capped = Bpe.wordFreqs(docs, maxWords = 3).map(_._1).toSeq
    assert(capped == Seq("the", "on", "sat"), s"capped=$capped")
  }

  test("tokenize: roundtrip within words, n_tokens consistent, empty doc empty") {
    val model = Bpe.train(docs, numMerges = 50)
    val out = Bpe.tokenize(docs, model).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[scala.collection.Seq[String]]("tokens").toSeq,
          r.getAs[Long]("n_tokens"))).toMap
    // per-doc token concat reproduces the lowercased de-spaced text
    docs.collect().foreach { r =>
      val (toks, n) = out(r.getLong(0))
      assert(toks.size.toLong == n)
      assert(toks.mkString == r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).mkString)
    }
    assert(out(3L)._1.isEmpty)
    // frequent words collapse: "the" must be a single learned token
    assert(out(0L)._1.count(_ == "the") == 2)
  }

  test("bpe token count is a drop-in packing budget") {
    val model = Bpe.train(docs, numMerges = 50)
    val packed = TrainingData.concatPack(
      docs.withColumn("grp", lit("g")), capacity = 8L, groupCols = Seq("grp"),
      tokensCol = Bpe.tokenCountCol(model)(col("text")))
    val total = packed.agg(sum("n_tokens")).head().getLong(0)
    val direct = Bpe.tokenize(docs, model).agg(sum("n_tokens")).head().getLong(0)
    assert(total == direct)
  }
}
