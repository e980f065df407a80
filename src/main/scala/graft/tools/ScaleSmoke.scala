package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Big-corpus perf tier: the five scale-critical plans at 10–50M rows —
  * far past the sf0.1 bench (whose 130 queries all finish in ≤3.4 s and no
  * longer stress the scale paths). Everything is synthesized with column
  * algebra (no files): deterministic xxhash64-derived words/vectors with
  * planted duplicates, so candidate volumes are realistic and expected
  * outputs are checkable.
  *
  * Opt-in:  SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.ScaleSmoke"
  * Scale:   SPARK_GRAFT_SCALE=0.1 shrinks every row count 10x (CI-sized).
  *
  * Each section prints `name  rows  seconds  out-rows` and asserts the
  * plan stays bucketed (no cartesian / nested-loop product) — numbers are
  * recorded in PERF.md per round.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "1.0").toDouble
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def n(base: Long): Long = math.max(1000L, (base * scale).toLong)

    def assertBucketed(df: DataFrame, label: String): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$label: cartesian in plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$label: BNLJ in plan")
    }

    def time(label: String, rows: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$label%-28s ${rows}%12d rows ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($out out)")
    }

    // deterministic word-salad text: `len` words hashed from (base, pos).
    // Rows where id % 200 < 2 form near-dup PAIRS (share a base, one word
    // mutated) — ~1% of the corpus, realistic dup density.
    def synthDocs(rows: Long, len: Int): DataFrame =
      spark.range(rows).select(
        col("id").as("doc_id"),
        pmod(col("id"), lit(8)).cast("string").as("source"),
        concat_ws(" ",
          transform(sequence(lit(0), lit(len - 1)),
            i => when(i === 0, concat(lit("w"), pmod(xxhash64(col("id"), i), lit(1000000))))
              .otherwise(concat(lit("w"), pmod(xxhash64(
                when(pmod(col("id"), lit(200)) < 2,
                  col("id") - pmod(col("id"), lit(200)))
                  .otherwise(col("id")), i), lit(1000000))))))
          .as("text"))

    def clusteredVecs(rows: Long, dims: Int, seedOff: Int, idCol: String, vecCol: String) =
      spark.range(rows).select(
        col("id").as(idCol),
        transform(sequence(lit(0), lit(dims - 1)),
          i => ((pmod(xxhash64(pmod(col("id"), lit(1024)), i), lit(1000)) / 1000.0) +
            (pmod(xxhash64(col("id") + seedOff, i), lit(100)) / 100.0 - 0.5) * 0.1)
            .cast("float")).as(vecCol))

    println(s"== ScaleSmoke (scale=$scale) ==")

    // 1. rp-batch ANN: 10M x 32-d clustered index, 64 queries, k=10
    locally {
      val rows = n(10000000L)
      val index = clusteredVecs(rows, 32, 7777, "vec_id", "embedding")
      val queries = clusteredVecs(64, 32, 555001, "query_id", "query_vec")
      val out = graft.ops.Ann.rpTopKBatch(queries, index, k = 10,
        nTables = 8, nProjs = 3, width = 0.12)
      assertBucketed(out, "rp_batch_ann")
      time("rp_batch_ann", rows) { out.count() }
    }

    // 2. vocabulary-free minhash near-dup pairs: 10M docs, ~50k planted pairs
    locally {
      val rows = n(10000000L)
      val out = graft.ops.Dedup.minHashPairsHashed(synthDocs(rows, 25),
        shingleSize = 1, numHashes = 64, bands = 16, minJaccard = 0.8)
      assertBucketed(out, "minhash_hashed_pairs")
      val expected = rows / 200 // one planted pair per 200 ids
      time(s"minhash_hashed_pairs", rows) {
        val c = out.count()
        assert(c >= (expected * 0.95).toLong && c <= (expected * 1.05).toLong,
          s"planted-pair count off: got $c expected ~$expected")
        c
      }
    }

    // 3. exact-substring span dedup: 2M docs x 30 tokens -> 22M windows
    locally {
      val rows = n(2000000L)
      val out = graft.ops.Dedup.exactSubstrDedup(synthDocs(rows, 30),
        windowTokens = 20)
      assertBucketed(out, "exact_substr_dedup")
      time("exact_substr_dedup", rows) { out.count() }
    }

    // 4. stratified sample at 50M rows, 100 strata x 1000 docs
    locally {
      val rows = n(50000000L)
      val docs = spark.range(rows).select(col("id").as("doc_id"),
        pmod(col("id"), lit(100)).cast("string").as("stratum"))
      val out = graft.ops.TrainingData.stratifiedSampleLarge(
        docs, "stratum", perStratum = 1000)
      assertBucketed(out, "stratified_sample_large")
      time("stratified_sample_large", rows) {
        val c = out.count()
        assert(c == 100 * 1000L, s"expected exactly 100k sampled, got $c")
        c
      }
    }

    // 5. token-budget mixture: 20M docs x 10 tokens across 8 sources
    locally {
      val rows = n(20000000L)
      val budgets = (0 until 8).map(s => s.toString -> 1000000L).toMap
      val out = graft.ops.TrainingData.tokenMixture(
        synthDocs(rows, 10), "source", budgets)
      assertBucketed(out, "token_mixture")
      time("token_mixture", rows) { out.count() }
    }

    // 6. BM25: index 5M docs x 25 words, score a 64-query batch at k=10.
    // The term-pruned probe must touch only postings of the queries'
    // terms — wall-clock is dominated by the one-time index build
    locally {
      val rows = n(5000000L)
      val docs = synthDocs(rows, 25)
      val idx = graft.search.Bm25.buildIndex(docs, "doc_id", "text")
      val queries = spark.range(64).select(
        col("id").as("query_id"),
        concat_ws(" ",
          transform(sequence(lit(0), lit(4)),
            i => concat(lit("w"), pmod(xxhash64(col("id") * 37 + 5, i),
              lit(1000000))))).as("query_text"))
      val out = graft.search.Bm25.topKBatch(queries, idx, k = 10)
      assertBucketed(out, "bm25_batch")
      time("bm25_batch", rows) { out.count() }
    }

    // 7. banded kNN join: top-5 neighbors for EVERY row of a 1M x 32-d
    // index with ~15-member natural clusters — the all-rows shape (a10's
    // scale path). Candidate volume for a kNN join is tables x N x
    // cluster-size by construction; a coarser cluster structure (the 2k-
    // member clusters of tier 1) makes ANY all-rows join intrinsically
    // quadratic-within-cluster and belongs to semantic dedup, not kNN
    locally {
      val rows = n(1000000L)
      val index = spark.range(rows).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(31)),
          i => ((pmod(xxhash64(pmod(col("id"), lit(65536)), i), lit(1000)) / 1000.0) +
            (pmod(xxhash64(col("id") + 7777, i), lit(100)) / 100.0 - 0.5) * 0.1)
            .cast("float")).as("embedding"))
      val out = graft.ops.Ann.knnJoinRp(index, k = 5,
        nTables = 4, nProjs = 3, width = 0.12, maxBucketSize = 100000)
      assertBucketed(out, "knn_join_rp")
      time("knn_join_rp", rows) { out.count() }
    }

    spark.stop()
  }
}
