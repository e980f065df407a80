package graft.ops

import graft.SparkSpec
import graft.ops.Expectations.Expectation
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "A"),
    (2L, -5.0, "A"),            // price violation
    (3L, 20.0, "X"),            // flag violation
    (4L, Double.NaN, "A")
  ).toDF("id", "price", "flag")
    .union(Seq((5L, 1.0, null: String)).toDF("id", "price", "flag")) // null flag

  test("check counts passes and violations per expectation in one pass") {
    val got = Expectations.check(df, Seq(
      Expectation("price_positive", col("price") > 0),
      Expectation("flag_in_domain", col("flag").isin("A", "B"))))
      .as[(String, Long, Long)].collect()
      .map { case (k, v, w) => k -> ((v, w)) }.toMap
    // Spark SQL orders NaN above every number (unlike IEEE), so NaN > 0
    // passes — a real gotcha for numeric range expectations
    assert(got("price_positive") == ((4L, 1L)))
    assert(got("flag_in_domain") == ((3L, 2L))) // 'X' and null both violate
  }

  test("null predicate results count as violations, not silently dropped") {
    val rows = Expectations.check(df, Seq(
      Expectation("flag_known", col("flag").isNotNull)))
      .as[(String, Long, Long)].head()
    assert(rows._2 + rows._3 == df.count())
  }

  test("quarantine splits rows exactly") {
    val (pass, fail) = Expectations.quarantine(df, col("price") > 0)
    assert(pass.count() + fail.count() == df.count())
    assert(fail.select("id").as[Long].collect().toSet == Set(2L)) // NaN passes (Spark NaN ordering)
  }
}
