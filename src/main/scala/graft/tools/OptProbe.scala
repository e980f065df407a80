package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the round-15 optimization pass: per-PHASE wall
  * time + Spark job count of the maintenance batteries that dominate the
  * bench tail (b8/b8b/b10/st11's BM25 lifecycle, st12/d19's minhash
  * store). Not part of the library surface; run via
  * `sbt "runMain graft.tools.OptProbe [sfDir]"`.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def phase[A](name: String)(f: => A): A = {
      Thread.sleep(200) // let listener drain
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"PHASE $name%-28s ${dt}%7.2f s  ${jobs.get() - j0}%3d jobs")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm footer cache
    // warm codegen/session the way Bench does
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import graft.search.Bm25
    (1 to 2).foreach { round =>
      println(s"== BM25 lifecycle (round $round: ${if (round == 1) "cold" else "warm"}) ==")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_opt_bm25").toString + "/idx"
      phase("writeIndex")(Bm25.writeIndex(docs, "doc_id", "text", tmp,
        termBuckets = 16))
      phase("deleteDocs")(Bm25.deleteDocs(spark, tmp, Seq(3L, 7L)))
      phase("compactIndex")(Bm25.compactIndex(spark, tmp))
      val idx = phase("loadIndex")(Bm25.loadIndex(spark, tmp))
      val qSeq = Seq(
        (0L, "window scan filter"),
        (1L, "vector merge customer"),
        (2L, "query slow spark"))
      val restricted = Bm25.restrictToTerms(
        idx, qSeq.flatMap(q => Bm25.tokenize(q._2)).distinct)
      phase("probe")(Bm25.topKBatch(
        qSeq.toDF("query_id", "query_text"), restricted, k = 10).count())

      println(s"== BM25 seg merge (round $round) ==")
      val tmp2 = java.nio.file.Files
        .createTempDirectory("graft_opt_bm25m").toString + "/idx"
      phase("writeIndex(2/3)")(Bm25.writeIndex(
        docs.where(pmod(col("doc_id"), lit(3)) < 2), "doc_id", "text", tmp2,
        termBuckets = 16))
      phase("3 appends")(Seq(0, 1, 2).foreach { r =>
        Bm25.appendIndex(spark,
          docs.where(pmod(col("doc_id"), lit(3)) === 2 &&
            pmod(col("doc_id"), lit(9)).isin(2 + 3 * r)),
          tmp2, "doc_id", "text")
      })
      phase("mergeSegments")(Bm25.mergeSegments(spark, tmp2, targetSegments = 2))

      println(s"== minhash store (round $round) ==")
      val docs60 = docs.where(col("doc_id") < 60).select("doc_id", "text")
      val tmp3 = java.nio.file.Files
        .createTempDirectory("graft_opt_mh").toString + "/idx"
      phase("writeMinhash")(graft.ops.Dedup.writeMinhash(
        docs60.where(pmod(col("doc_id"), lit(3)) =!= 0), tmp3,
        shingleSize = 1, numHashes = 128, bands = 32))
      phase("intakeBatch1")(graft.ops.CorpusPipeline.nearDupIntakeBatch(spark,
        docs60.where(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 30),
        tmp3))
      phase("intakeBatch2")(graft.ops.CorpusPipeline.nearDupIntakeBatch(spark,
        docs60.where(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") >= 30),
        tmp3))
      phase("deleteMinhash")(graft.ops.Dedup.deleteMinhash(spark, tmp3,
        Seq(17L, 20L)))
      phase("compactMinhash")(graft.ops.Dedup.compactMinhash(spark, tmp3))

      println(s"== serving loop (round $round) ==")
      import graft.serve.{CachedRag, ChatRag}
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val echo: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        missQ => missQ.select(col("query_id"), col("question"),
          concat(lit("computed: "), col("question")).as("answer"),
          lit(0.5).as("cost"))
      def turnBatch(i: Int) = {
        import spark.implicits._
        Seq(3L, 7L, 11L).map(b => (s"s$b", b + i)).toDF("session_id", "qdoc")
          .join(docs, col("qdoc") === col("doc_id"))
          .join(emb, col("qdoc") === col("vec_id"))
          .select(col("session_id"),
            (col("qdoc") + lit(100L * i)).as("query_id"),
            col("text").as("question"), col("embedding").as("query_vec"))
      }
      val root4 = java.nio.file.Files.createTempDirectory("graft_opt_srv").toString
      val (mem, cache) = (s"$root4/memory", s"$root4/cache")
      phase("chatTurn t0")(ChatRag.chatTurn(spark, turnBatch(0), mem, cache,
        minCos = 0.999, echo).count())
      phase("chatTurn t1")(ChatRag.chatTurn(spark, turnBatch(1), mem, cache,
        minCos = 0.999, echo).count())
      phase("cachedAnswerBatch")(CachedRag.cachedAnswerBatch(spark,
        turnBatch(2).select("query_id", "question", "query_vec"),
        cache, minCos = 0.999, echo).count())
    }
    spark.stop()
  }
}
