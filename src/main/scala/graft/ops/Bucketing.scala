package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located large⋈large joins.
  *
  * A join between two tables bucketed (and sorted) on the join key with
  * the same bucket count needs NO shuffle and NO sort at query time — each
  * task zips bucket i of both sides. For the recurring joins of a 100 TB
  * warehouse (fact⋈fact on order keys, chunk⋈embedding on chunk_id) this
  * converts every query's O(data) shuffle into a one-time layout cost at
  * write, which is the single biggest repeated-query win Spark offers.
  * (Bucketing requires the table catalog — parquet paths alone don't carry
  * bucket metadata.)
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      nBuckets: Int = 32): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
