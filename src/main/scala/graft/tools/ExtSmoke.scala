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

    // optimizer rule: user writes the naive window-rank top-k; with the
    // conf on, the planner swaps in the bounded-heap aggregate
    spark.conf.set("spark.graft.rewriteWindowTopK", "true")
    val windowSql =
      """SELECT query_id, rank, vec_id, round(dist, 4) AS dist FROM (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |    l2_distance(e.embedding, q.embedding) AS dist,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY l2_distance(e.embedding, q.embedding) ASC, e.vec_id ASC) AS rank
        |  FROM emb e CROSS JOIN (SELECT * FROM emb WHERE vec_id IN (3, 7, 11)) q
        |) WHERE rank <= 3""".stripMargin
    val df = spark.sql(windowSql)
    val plan = df.queryExecution.executedPlan.toString
    println(s"rewritten: topk_by_dist=${plan.contains("topk_by_dist")} " +
      s"window=${plan.contains("Window")}")
    df.orderBy("query_id", "rank").show(9)
    spark.stop()
  }
}
