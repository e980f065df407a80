package graft.tools

import graft.GraftExtensions
import graft.search.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures window-rank batch top-k vs the rewritten/bounded-heap plans
  * on a synthetic 200k x 32-dim index. Usage: sbt "runMain graft.tools.PerfSmoke"
  */
object PerfSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dims = 32
    val index = spark.range(200000).select(
      col("id").as("chunk_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / 1000.0).cast("float"))
        .as("embedding"))
      .persist()
    index.count()
    val queries = spark.range(8).select(
      col("id").as("query_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        i => (pmod(xxhash64(col("id") + 777, i), lit(1000)) / 1000.0).cast("float"))
        .as("query_vec"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    // warm
    Knn.topKBatch(queries, index, 10).count()

    spark.conf.set("spark.graft.rewriteWindowTopK", "false")
    time("window (naive)") {
      Knn.topKBatchWindow(queries, index, 10)
        .select("query_id", "rank", "chunk_id", "dist").count()
    }
    spark.conf.set("spark.graft.rewriteWindowTopK", "true")
    time("window + rewrite rule") {
      Knn.topKBatchWindow(queries, index, 10)
        .select("query_id", "rank", "chunk_id", "dist").count()
    }
    time("aggregate (direct)") {
      Knn.topKBatch(queries, index, 10).count()
    }
    spark.stop()
  }
}
