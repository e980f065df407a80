package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives SparkEntry.entry exactly as the driver smoke-check does. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"entry rows: ${rows.length}")
    rows.take(2).foreach(r => println(r.toString.take(200)))
    spark.stop()
  }
}
