package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns identical rows to the plain join") {
    // one pathologically hot key (90% of big side) + long tail
    val big = ((1 to 900).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"tail$i")))
      .toDF("k", "payload")
    val small = (1 to 200).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val plain = big.join(small, Seq("k")).select("k", "payload", "attr")
      .as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "payload", "attr")
      .as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 1000)
  }

  test("salting actually spreads the hot key across salt values") {
    val big = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salts = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 4, s"expected the hot key spread over >4 salts, got $salts")
  }

  test("outer join types are rejected (would duplicate small-side rows)") {
    val big = Seq((1L, "a")).toDF("k", "payload")
    val small = Seq((1L, "x"), (9L, "unmatched")).toDF("k", "attr")
    val ex = intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", 4, joinType = "full_outer")
    }
    assert(ex.getMessage.contains("salt"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", 4, joinType = "right")
    }
  }

  test("left join semantics preserved under salting") {
    val big = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("k", "payload")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "attr")
    val got = Skew.saltedJoin(big, small, "k", 4, joinType = "left")
      .select("k", "payload", "attr")
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "a", Some("x")), (2L, "b", Some("y")), (99L, "orphan", None)))
  }
}
