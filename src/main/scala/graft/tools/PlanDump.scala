package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for the round-15 optimization pass: write
  * `.explain("formatted")` of named registered queries to files, so the
  * before/after plan evidence under `plans/r15/` is reproducible. Not part
  * of the library surface.
  * Usage: sbt "runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val df = qs(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"dumped $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
