package graft.tools

import graft.ops.{Ann, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tuning harness for [[graft.ops.Ann.cosinePairsRp]]: recall vs the exact
  * pair set and wall time as a function of `nTables`, at the adversarial
  * loose threshold the registered `a3` query uses. Run:
  * `sbt "runMain graft.tools.RpTune [sfDir]"`.
  */
object RpTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    val t0 = System.nanoTime()
    val exact = Dedup.cosinePairsExact(emb, minCos = 0.4, maxExactRows = 1 << 20)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"exact: ${exact.size} pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    for (nt <- Seq(2, 4, 6, 8, 12)) {
      val t1 = System.nanoTime()
      val got = Ann.cosinePairsRp(emb, minCos = 0.4, nTables = nt)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t1) / 1e9
      val recall = if (exact.isEmpty) 1.0 else got.count(exact.contains).toDouble / exact.size
      println(f"nTables=$nt%2d  recall=$recall%.4f  pairs=${got.size}%6d  time=$sec%6.2f s")
    }
    spark.stop()
  }
}
