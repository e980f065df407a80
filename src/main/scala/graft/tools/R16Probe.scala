package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the round-16 optimization pass: per-PHASE wall
  * time + Spark job count + TASK count of the verdict's target list (the
  * graph loops' tiny-frame fan-out, d11, loadIndex's scalar jobs, the
  * neardup intake, the chat serving tail, d18). Task count is the new
  * column: round 15 established these batteries are job-count bound; the
  * 8-vs-32-core anti-scaling of p17/d11 says some of them are TASK-count
  * bound (empty tasks × shuffle.partitions × iterations). Not part of
  * the library surface; run via `sbt "runMain graft.tools.R16Probe [sfDir] [sections]"`.
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections = args.drop(1).headOption.map(_.split(",").toSet)
    def want(s: String): Boolean = sections.forall(_.contains(s))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        tasks.addAndGet(sc.stageInfo.numTasks); ()
      }
    })
    def phase[A](name: String)(f: => A): A = {
      Thread.sleep(300)
      val (j0, t0) = (jobs.get(), tasks.get())
      val w0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - w0) / 1e9
      Thread.sleep(300)
      println(f"PHASE $name%-30s ${dt}%7.2f s ${jobs.get() - j0}%4d jobs ${tasks.get() - t0}%5d tasks")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    spark.range(1000000L).selectExpr("sum(id)").collect()

    if (want("stats")) {
      println("== planBytes estimates ==")
      def est(name: String, df: DataFrame): Unit =
        println(f"EST $name%-30s ${graft.ops.Layout.planBytes(df)}")
      val d200 = docs.where(col("doc_id") < 200)
      est("documents scan", docs)
      est("docs<200", d200)
      est("edges p17", docs.select((col("doc_id") % 37).as("src"),
        ((col("doc_id") * 7 + 3) % 37).as("dst")))
      est("minhash pairs d17", graft.ops.Dedup.minHashPairsHashed(
        d200, shingleSize = 1, numHashes = 128, bands = 32, minJaccard = 0.8))
      est("jaccard pairs d9", graft.ops.Dedup.jaccardPairs(
        docs.where(col("doc_id") < 60), minSim = 0.8))
      est("localCheckpoint of docs<200", d200.localCheckpoint(true))
      est("ckpt + join", d200.localCheckpoint(true)
        .join(docs.select("doc_id"), Seq("doc_id")))
    }

    if (want("graph")) {
      println("== graph loops (p17/p19/p18 shapes) ==")
      val edges = docs.select(
        (col("doc_id") % 37).as("src"),
        ((col("doc_id") * 7 + 3) % 37).as("dst"))
      def withConf[A](kvs: (String, String)*)(f: => A): A = {
        val prev = kvs.map { case (k, _) => k -> spark.conf.get(k) }
        kvs.foreach { case (k, v) => spark.conf.set(k, v) }
        try f finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
      }
      (1 to 2).foreach { r =>
        phase(s"pageRank base (run $r)")(
          graft.ops.HostGraph.pageRank(edges, iterations = 10).count())
      }
      (1 to 2).foreach { r =>
        phase(s"pageRank sp=1 (run $r)")(withConf(
          "spark.sql.shuffle.partitions" -> "1")(
          graft.ops.HostGraph.pageRank(edges, iterations = 10).count()))
      }
      (1 to 2).foreach { r =>
        phase(s"pageRank sp=1,noaqe (run $r)")(withConf(
          "spark.sql.shuffle.partitions" -> "1",
          "spark.sql.adaptive.enabled" -> "false")(
          graft.ops.HostGraph.pageRank(edges, iterations = 10).count()))
      }
      phase("hits base")(
        graft.ops.HostGraph.hits(edges, iterations = 8).count())
      phase("hits sp=1")(withConf(
        "spark.sql.shuffle.partitions" -> "1")(
        graft.ops.HostGraph.hits(edges, iterations = 8).count()))
      phase("hits sp=1,noaqe")(withConf(
        "spark.sql.shuffle.partitions" -> "1",
        "spark.sql.adaptive.enabled" -> "false")(
        graft.ops.HostGraph.hits(edges, iterations = 8).count()))
    }

    if (want("d11")) {
      println("== d11 repeatedNgrams ==")
      (1 to 3).foreach { r =>
        phase(s"repeatedNgrams (run $r)")(
          graft.ops.TrainingData.repeatedNgrams(docs, n = 2, minDocs = 3L)
            .orderBy(desc("df"), col("gram")).limit(100).count())
      }
    }

    if (want("d18b")) {
      println("== d18 pairs pipeline conf sensitivity ==")
      val d = docs.where(col("doc_id") < 200)
      def withConf[A](kvs: (String, String)*)(f: => A): A = {
        val prev = kvs.map { case (k, _) => k -> spark.conf.get(k) }
        kvs.foreach { case (k, v) => spark.conf.set(k, v) }
        try f finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
      }
      def pairs() = graft.ops.Ann.materializeOnce(
        graft.ops.Dedup.minHashPairsHashed(d, shingleSize = 1,
          numHashes = 128, bands = 32, minJaccard = 0.8))
      (1 to 2).foreach { r => phase(s"pairs base (run $r)")(pairs()) }
      (1 to 2).foreach { r =>
        phase(s"pairs sp=1 (run $r)")(withConf(
          "spark.sql.shuffle.partitions" -> "1")(pairs()))
      }
      (1 to 2).foreach { r =>
        phase(s"pairs sp=1,noaqe (run $r)")(withConf(
          "spark.sql.shuffle.partitions" -> "1",
          "spark.sql.adaptive.enabled" -> "false")(pairs()))
      }
      (1 to 2).foreach { r =>
        phase(s"pairs noaqe (run $r)")(withConf(
          "spark.sql.adaptive.enabled" -> "false")(pairs()))
      }
    }

    if (want("d18")) {
      println("== d18 quality_resolve phases ==")
      (1 to 2).foreach { r =>
        val d = docs.where(col("doc_id") < 200)
        val scored = d.select(col("doc_id"),
          graft.ops.TextAnalytics.qualityScore(col("text")).as("quality"))
        val pairs = phase(s"minHashPairsHashed (run $r)")(
          graft.ops.Ann.materializeOnce(
            graft.ops.Dedup.minHashPairsHashed(d, shingleSize = 1,
              numHashes = 128, bands = 32, minJaccard = 0.8)))
        phase(s"resolveNearDupsBy (run $r)")(
          graft.ops.Dedup.resolveNearDupsBy(scored, pairs,
            smallGraphCollect = 1L << 20).count())
      }
    }

    if (want("bm25load")) {
      println("== BM25 at-rest load + probe ==")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_r16_bm25").toString + "/idx"
      phase("writeIndex")(graft.search.Bm25.writeIndex(
        docs, "doc_id", "text", tmp, termBuckets = 16))
      val qSeq = Seq((0L, "window scan filter"), (1L, "vector merge customer"),
        (2L, "query slow spark"))
      (1 to 3).foreach { r =>
        val idx = phase(s"loadIndex (run $r)")(
          graft.search.Bm25.loadIndex(spark, tmp))
        val restricted = graft.search.Bm25.restrictToTerms(
          idx, qSeq.flatMap(q => graft.search.Bm25.tokenize(q._2)).distinct)
        phase(s"probe (run $r)")(graft.search.Bm25.topKBatch(
          qSeq.toDF("query_id", "query_text"), restricted, k = 10).count())
      }
    }

    if (want("intakejobs")) {
      println("== intake job trace ==")
      val docs60 = docs.where(col("doc_id") < 60).select("doc_id", "text")
      val tmpJ = java.nio.file.Files
        .createTempDirectory("graft_r16_mhj").toString + "/idx"
      graft.ops.Dedup.writeMinhash(
        docs60.where(pmod(col("doc_id"), lit(3)) =!= 0), tmpJ,
        shingleSize = 1, numHashes = 128, bands = 32)
      val t0 = new java.util.concurrent.atomic.AtomicLong(0)
      val lst = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val now = System.nanoTime()
          val gap = if (t0.get == 0) 0.0 else (now - t0.get) / 1e6
          t0.set(now)
          val cs = js.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
            .mkString(" | ").take(120)
          println(f"JOB ${js.jobId}%4d +$gap%7.1f ms  $cs")
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = ()
      }
      spark.sparkContext.addSparkListener(lst)
      graft.ops.CorpusPipeline.nearDupIntakeBatch(spark,
        docs60.where(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 30),
        tmpJ)
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(lst)
    }

    if (want("intake")) {
      println("== minhash intake ==")
      val docs60 = docs.where(col("doc_id") < 60).select("doc_id", "text")
      val tmp3 = java.nio.file.Files
        .createTempDirectory("graft_r16_mh").toString + "/idx"
      phase("writeMinhash")(graft.ops.Dedup.writeMinhash(
        docs60.where(pmod(col("doc_id"), lit(3)) =!= 0), tmp3,
        shingleSize = 1, numHashes = 128, bands = 32))
      phase("intakeBatch1")(graft.ops.CorpusPipeline.nearDupIntakeBatch(spark,
        docs60.where(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") < 30),
        tmp3))
      phase("intakeBatch2")(graft.ops.CorpusPipeline.nearDupIntakeBatch(spark,
        docs60.where(pmod(col("doc_id"), lit(3)) === 0 && col("doc_id") >= 30),
        tmp3))
    }

    if (want("servejobs")) {
      println("== chatTurn job trace ==")
      import graft.serve.ChatRag
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      emb.count()
      val echo: DataFrame => DataFrame =
        missQ => missQ.select(col("query_id"), col("question"),
          concat(lit("computed: "), col("question")).as("answer"),
          lit(0.5).as("cost"))
      def turnBatch(i: Int) = {
        Seq(3L, 7L, 11L).map(b => (s"s$b", b + i)).toDF("session_id", "qdoc")
          .join(docs, col("qdoc") === col("doc_id"))
          .join(emb, col("qdoc") === col("vec_id"))
          .select(col("session_id"),
            (col("qdoc") + lit(100L * i)).as("query_id"),
            col("text").as("question"), col("embedding").as("query_vec"))
      }
      val rootJ = java.nio.file.Files.createTempDirectory("graft_r16_sj").toString
      ChatRag.chatTurn(spark, turnBatch(0), s"$rootJ/memory", s"$rootJ/cache",
        minCos = 0.999, echo).count()
      val t0 = new java.util.concurrent.atomic.AtomicLong(0)
      val lst = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val now = System.nanoTime()
          val gap = if (t0.get == 0) 0.0 else (now - t0.get) / 1e6
          t0.set(now)
          val cs = js.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
            .mkString(" | ").take(110)
          println(f"JOB ${js.jobId}%4d +$gap%7.1f ms  $cs")
        }
      }
      spark.sparkContext.addSparkListener(lst)
      val w0 = System.nanoTime()
      ChatRag.chatTurn(spark, turnBatch(1), s"$rootJ/memory", s"$rootJ/cache",
        minCos = 0.999, echo).count()
      println(f"TURN WALL ${(System.nanoTime() - w0) / 1e9}%.2f s")
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(lst)
    }

    if (want("serve")) {
      println("== serving loop ==")
      import graft.serve.{CachedRag, ChatRag}
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      emb.count()
      val echo: DataFrame => DataFrame =
        missQ => missQ.select(col("query_id"), col("question"),
          concat(lit("computed: "), col("question")).as("answer"),
          lit(0.5).as("cost"))
      def turnBatch(i: Int) = {
        Seq(3L, 7L, 11L).map(b => (s"s$b", b + i)).toDF("session_id", "qdoc")
          .join(docs, col("qdoc") === col("doc_id"))
          .join(emb, col("qdoc") === col("vec_id"))
          .select(col("session_id"),
            (col("qdoc") + lit(100L * i)).as("query_id"),
            col("text").as("question"), col("embedding").as("query_vec"))
      }
      val root4 = java.nio.file.Files.createTempDirectory("graft_r16_srv").toString
      val (mem, cache) = (s"$root4/memory", s"$root4/cache")
      phase("chatTurn t0")(ChatRag.chatTurn(spark, turnBatch(0), mem, cache,
        minCos = 0.999, echo).count())
      phase("chatTurn t1")(ChatRag.chatTurn(spark, turnBatch(1), mem, cache,
        minCos = 0.999, echo).count())
      phase("chatTurn t2")(ChatRag.chatTurn(spark, turnBatch(2), mem, cache,
        minCos = 0.999, echo).count())
      phase("cachedAnswerBatch")(CachedRag.cachedAnswerBatch(spark,
        turnBatch(3).select("query_id", "question", "query_vec"),
        cache, minCos = 0.999, echo).count())
    }

    spark.stop()
  }
}
