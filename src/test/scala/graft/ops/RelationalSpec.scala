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

  test("banded range join equals the naive range predicate join") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:30:00")),
      (2L, ts("2024-01-01 01:00:00")), // exactly at a bucket boundary
      (3L, ts("2024-01-01 02:59:59")),
      (4L, ts("2024-01-01 03:00:00")), // == w_end: excluded (half-open)
      (5L, ts("2024-02-01 00:00:00"))  // outside everything
    ).toDF("event_id", "ts")
    val intervals = Seq(
      ("a", ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00")),
      ("b", ts("2024-01-01 00:45:00"), ts("2024-01-01 01:10:00")) // overlaps a
    ).toDF("win", "w_start", "w_end")
    val banded = Relational.bandedRangeJoin(rows, intervals, "ts", "w_start", "w_end")
      .select("event_id", "win").as[(Long, String)].collect().toSet
    val naive = rows.join(intervals,
      $"ts" >= $"w_start" && $"ts" < $"w_end")
      .select("event_id", "win").as[(Long, String)].collect().toSet
    assert(banded == naive)
    assert(banded == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "a")))
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
