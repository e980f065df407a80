package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 12:00:00")),
      (3L, 100L, ts("2024-01-01 08:00:00")), // before any right row
      (4L, 200L, ts("2024-01-01 10:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 09:00:00"), 1.0),
      (100L, ts("2024-01-01 10:00:00"), 2.0), // exact tie with left #1: inclusive
      (100L, ts("2024-01-01 11:30:00"), 3.0)
    ).toDF("user_id", "ts", "value")
    val got = Relational.asofJoin(left, right, Seq("user_id"), "ts", "ts", Seq("value"))
      .select($"event_id", $"asof_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(
      1L -> Some(2.0), // exact-ts right row wins (inclusive <=)
      2L -> Some(3.0),
      3L -> None,      // no prior right row
      4L -> None))     // key absent from right side
  }

  test("salted and plain shipping-priority agree end-to-end on fixtures") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", 16)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(plain == salted)
  }
}
