package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: count + describe the Spark jobs one
  * nearDupIntakeBatch issues (the st12 latency unit). Not part of the
  * library surface; run via `sbt "runMain graft.tools.JobCountProbe"`.
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files
      .createTempDirectory("graft_jobprobe").toString + "/store"
    graft.ops.Dedup.writeMinhash(
      Seq((100L, "alpha beta gamma delta epsilon"),
        (101L, "one two three four five six")).toDF("doc_id", "text"),
      tmp, shingleSize = 1, numHashes = 128, bands = 32)

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val det = js.stageInfos.map(_.details.linesIterator
          .filter(l => l.contains("graft") || l.contains("Dataset") ||
            l.contains("SQLExecution") || l.contains("Exchange"))
          .take(3).mkString(" << ")).mkString(" ||| ")
        jobs.add(s"${js.jobId}  ${det.take(240)}")
      }
    })

    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "completely novel content here"),
      (3L, "completely novel content here")
    ).toDF("doc_id", "text")

    // fused path
    jobs.clear()
    var t0 = System.nanoTime()
    graft.ops.CorpusPipeline.nearDupIntakeBatch(spark, batch, tmp)
    var dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    import scala.jdk.CollectionConverters._
    println(f"== fused: ${jobs.size} jobs  $dt%.2f s ==")

    // old unfused composition (the pre-round-9 body, public APIs)
    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft_jobprobe2").toString + "/store"
    graft.ops.Dedup.writeMinhash(
      Seq((100L, "alpha beta gamma delta epsilon"),
        (101L, "one two three four five six")).toDF("doc_id", "text"),
      tmp2, shingleSize = 1, numHashes = 128, bands = 32)
    jobs.clear()
    t0 = System.nanoTime()
    locally {
      val meta = spark.read.parquet(s"$tmp2/meta")
        .select("shingle_size", "num_hashes", "bands").head
      val ownIds = batch.select(col("doc_id").as("corpus_id")).distinct()
      val corpusDups = graft.ops.Dedup.nearDupesAgainstStore(
        spark, batch, tmp2, "doc_id", "text", 0.8)
        .join(broadcast(ownIds), Seq("corpus_id"), "left_anti")
        .select(col("batch_id").as("doc_id")).distinct()
      val afterCorpus = batch.join(corpusDups, Seq("doc_id"), "left_anti")
      val losers = graft.ops.Dedup.minHashPairsHashed(afterCorpus, "doc_id", "text",
        shingleSize = meta.getInt(0), numHashes = meta.getInt(1),
        bands = meta.getInt(2), minJaccard = 0.8)
        .select(col("id_b").cast("long").as("doc_id")).distinct()
      val survivors = afterCorpus.join(losers, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      graft.ops.Dedup.appendMinhash(spark, survivors, tmp2, "doc_id", "text")
    }
    dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    println(f"== unfused: ${jobs.size} jobs  $dt%.2f s ==")
    spark.stop()
  }
}
