package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the spark.sql.extensions config path in a fresh JVM: no
  * register() call anywhere — pure SQL must see every graft function.
  */
object ExtSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    // full SQL-only kNN through injected functions
    spark.sql(
      """SELECT vec_id, round(l2_distance(embedding,
        |  (SELECT first(embedding) FROM emb WHERE vec_id = 7)), 4) AS dist
        |FROM emb ORDER BY dist, vec_id LIMIT 4""".stripMargin).show()
    spark.sql(
      """SELECT topk_by_dist(CAST(vec_id AS DOUBLE), vec_id, 3) AS top FROM emb""")
      .show(false)
    spark.sql("SELECT recursive_split('aaaa bbbb cccc dddd', 10, 3) AS (i, c)").show()
    println("DESCRIBE: " + spark.sql("DESCRIBE FUNCTION l2_distance")
      .collect().map(_.getString(0)).mkString(" | "))
    spark.stop()
  }
}
