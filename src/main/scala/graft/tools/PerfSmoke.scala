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

    // ---- batch ANN vs brute force on CLUSTERED data (the realistic shape:
    // embeddings of a curated corpus cluster by topic; uniform noise is the
    // LSH worst case and would under-sell nothing but the data model)
    println("== batch ANN vs brute force: 64 queries x 1M clustered index ==")
    def clustered(n: Long, seedOff: Int, idCol: String, vecCol: String) =
      spark.range(n).select(
        col("id").as(idCol),
        transform(sequence(lit(0), lit(dims - 1)),
          i => ((pmod(xxhash64(pmod(col("id"), lit(256)), i), lit(1000)) / 1000.0) +
            (pmod(xxhash64(col("id") + seedOff, i), lit(100)) / 100.0 - 0.5) * 0.1)
            .cast("float")).as(vecCol))
    val cIndex = clustered(1000000, 7777, "chunk_id", "embedding").persist()
    cIndex.count()
    val q64 = clustered(64, 555001, "query_id", "query_vec").persist()
    q64.count()

    val exact = Knn.topKBatch(q64, cIndex, 10).persist()
    time("brute-force topKBatch x64") { exact.count() }

    // bucketLength at the WITHIN-cluster projection sigma (~0.03 here):
    // wider slabs merge clusters into one bucket and the probe join
    // degenerates toward all-pairs — the #1 LSH tuning failure
    var t0 = System.nanoTime()
    val (hashed, model) = graft.ops.Ann.fitLsh(cIndex, "embedding",
      bucketLength = 0.05, numHashTables = 4)
    val hashedP = hashed.persist(); hashedP.count()
    println(f"LSH fit+hash (amortized)     ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    val lsh = graft.ops.Ann.lshTopKBatch(q64, hashedP, model, 10,
      idCol = "chunk_id", vecCol = "embedding").persist()
    time("LSH batch probe x64") { lsh.count() }

    t0 = System.nanoTime()
    val (assigned, cents) = graft.ops.Ann.buildIvf(cIndex, "embedding", nLists = 16)
    val assignedP = assigned.persist(); assignedP.count()
    println(f"IVF build (amortized)        ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    val ivf = graft.ops.Ann.ivfTopKBatch(assignedP, cents, q64, 10, nProbe = 4,
      idCol = "chunk_id", vecCol = "embedding").persist()
    time("IVF batch probe x64 (4/16)") { ivf.count() }

    // multi-projection RP-LSH: banding is the amortized half (pure column
    // algebra, no fit); the probe itself reuses it
    t0 = System.nanoTime()
    val rpBands = graft.ops.Ann.rpIndexBands(cIndex, "chunk_id", "embedding",
      nTables = 8, nProjs = 3, width = 0.2)
    rpBands.bands.persist().count()
    println(f"RP-LSH banding (amortized)   ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    val rp = graft.ops.Ann.rpTopKBatch(q64, cIndex, 10,
      nTables = 8, nProjs = 3, width = 0.2,
      idCol = "chunk_id", vecCol = "embedding", indexBands = Some(rpBands)).persist()
    time("RP-LSH batch probe x64") { rp.count() }

    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      exact.select("query_id", "chunk_id")
        .join(approx.select("query_id", "chunk_id"), Seq("query_id", "chunk_id"))
        .count().toDouble / exact.count()
    println(f"LSH recall@10 vs exact: ${recall(lsh)}%.3f")
    println(f"IVF recall@10 vs exact: ${recall(ivf)}%.3f")
    println(f"RP-LSH recall@10 vs exact: ${recall(rp)}%.3f")
    spark.stop()
  }
}
