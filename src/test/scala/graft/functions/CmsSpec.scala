package graft.functions

import graft.SparkSpec
import graft.ops.TextAnalytics
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma alpha", "s0"),
    (2L, "alpha beta beta delta", "s0"),
    (3L, "gamma gamma epsilon alpha", "s1"),
    (4L, "zeta zeta zeta zeta", "s1"),
    (5L, "alpha epsilon", "s2")
  ).toDF("doc_id", "text", "source")

  private lazy val exactCounts: Map[String, Long] = docs
    .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    .groupBy("term").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("merged shard sketches answer exactly like one global sketch") {
    graft.functions.CmsFunctions.register(spark)
    val sharded = TextAnalytics.termSketches(docs, "source")
    assert(sharded.count() == 3)
    val global = TextAnalytics.termSketches(docs.withColumn("g", lit(1)), "g")
    val terms = exactCounts.keys.toSeq.toDF("term")
    val mergedEst = TextAnalytics.cmsTermEstimates(sharded, terms)
      .select("term", "est_cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val globalEst = TextAnalytics.cmsTermEstimates(global, terms)
      .select("term", "est_cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedEst == globalEst, "counter-wise merge must equal the one-pass sketch")
  }

  test("estimates are upper bounds within eps*N; exact here (tiny corpus, wide sketch)") {
    val sketches = TextAnalytics.termSketches(docs, "source", eps = 0.001)
    val est = TextAnalytics.cmsTermEstimates(sketches, exactCounts.keys.toSeq.toDF("term"))
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("est_cnt")).toMap
    val n = exactCounts.values.sum
    exactCounts.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS must never undercount: $t est=${est(t)} exact=$c")
      assert(est(t) <= c + math.ceil(0.001 * n).toLong + 1,
        s"estimate outside eps*N bound for $t")
    }
  }

  test("SQL surface: cms_merge + cms_estimate over a persisted sketch table") {
    TextAnalytics.termSketches(docs, "source").createOrReplaceTempView("term_sketches")
    val got = spark.sql(
      "SELECT cms_estimate(cms_merge(sketch), 'alpha') AS est FROM term_sketches")
      .as[Long].head()
    assert(got == exactCounts("alpha"))
  }

  test("long items: hash-compatible with the built-in aggregate's addLong path") {
    val sk = spark.range(100)
      .select(col("id") % 7 as "k")
      .agg(count_min_sketch(col("k"), lit(0.001), lit(0.99), lit(7)).as("sketch"))
    sk.createOrReplaceTempView("long_sketch")
    val est = spark.sql("SELECT cms_estimate(sketch, CAST(3 AS BIGINT)) AS e FROM long_sketch")
      .as[Long].head()
    // ids 3,10,...,94 -> 14 occurrences; 7 distinct keys in a 2000-wide
    // sketch leave no room for collisions, so the estimate is exact
    assert(est == 14L)
  }

  test("type checks: non-binary sketch and non-string/long item are refused") {
    val df = Seq((1, "a")).toDF("n", "s")
    df.createOrReplaceTempView("cms_bad")
    intercept[AnalysisException] {
      spark.sql("SELECT cms_merge(n) FROM cms_bad").collect()
    }
    intercept[AnalysisException] {
      spark.sql("SELECT cms_estimate(CAST('x' AS BINARY), 1.5) FROM cms_bad").collect()
    }
  }

  test("incompatible sketch params refuse to merge (library guard surfaces)") {
    val a = docs.agg(count_min_sketch(col("text"), lit(0.01), lit(0.99), lit(1)).as("sketch"))
    val b = docs.agg(count_min_sketch(col("text"), lit(0.01), lit(0.99), lit(2)).as("sketch"))
    val ex = intercept[Exception] {
      a.unionByName(b).agg(call_function("cms_merge", col("sketch"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("deterministic: same corpus + seed -> byte-identical sketches") {
    val a = TextAnalytics.termSketches(docs, "source").orderBy("source")
      .select("sketch").as[Array[Byte]].collect()
    val b = TextAnalytics.termSketches(docs, "source").orderBy("source")
      .select("sketch").as[Array[Byte]].collect()
    assert(a.length == b.length &&
      a.zip(b).forall { case (x, y) => java.util.Arrays.equals(x, y) })
  }
}
