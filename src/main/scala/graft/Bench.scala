package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times each registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A query that throws is recorded under "errors"
  * (and excluded from the total) instead of masquerading as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    // Warm the JVM/session (codegen, parquet footer cache) so the first
    // measured query doesn't absorb startup cost.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // Sub-5s timings carry ±50% variance on a shared box; per-query numbers
    // are medians over `runs` repeats so round-over-round regressions are
    // detectable. "queries" stays name→seconds (driver contract); the raw
    // samples ride along under "runs".
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // Soft wall-clock budget: every query always gets its first run, but
    // repeat runs (for the median) stop once the budget is spent — bounds
    // total bench time no matter how many queries are registered.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "480").toDouble
    val benchStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchStart) / 1e9
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      var i = 0
      while (i < nRuns && !failed && (i == 0 || elapsedSec < budgetSec)) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          samples += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            failed = true
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        i += 1
      }
      // keep successful samples even when a later repeat fails (transient
      // failures must not erase a measured data point)
      if (samples.nonEmpty) timings(name) = samples.toSeq
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val qs = timings.map { case (k, v) => s""""${esc(k)}":${median(v)}""" }
      .mkString("{", ",", "}")
    val runs = timings.map { case (k, v) => s""""${esc(k)}":[${v.mkString(",")}]""" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = timings.values.map(median).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"n_runs":$nRuns,"errors":$errs,"sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
