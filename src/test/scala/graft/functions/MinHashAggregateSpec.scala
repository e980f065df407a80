package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class MinHashAggregateSpec extends SparkSpec {
  import spark.implicits._

  MinHashAggregate.register(spark)

  /** The pre-round-15 unrolled shape minhash_sig replaced — kept here as
    * the parity oracle: numHashes min(xxhash64(h, p)) columns folded by
    * array(). Bit-exact agreement on random data is the whole contract
    * (the d5b/d19b golden pins were minted against this shape).
    */
  private def unrolledSig(
      df: org.apache.spark.sql.DataFrame, numHashes: Int) = {
    val minCols = (0 until numHashes).map(p =>
      min(xxhash64(col("__h"), lit(p))).as(s"__m$p"))
    df.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(p => col(s"__m$p")): _*).as("__sig"))
  }

  test("property: bit-exact vs the unrolled min(xxhash64) shape (10 trials)") {
    val rnd = new Random(42)
    for (trial <- 0 until 10) {
      val n = 1 + rnd.nextInt(500)
      val numHashes = Seq(1, 16, 64, 128)(rnd.nextInt(4))
      val rows = Seq.fill(n)((rnd.nextInt(20).toLong, rnd.nextLong()))
      val df = rows.toDF("doc_id", "__h").repartition(2 + rnd.nextInt(5))
      val got = df.groupBy($"doc_id")
        .agg(call_function("minhash_sig", $"__h", lit(numHashes)).as("__sig"))
        .as[(Long, Seq[Long])].collect().toMap
      val expected = unrolledSig(df, numHashes)
        .as[(Long, Seq[Long])].collect().toMap
      assert(got == expected, s"trial $trial (n=$n numHashes=$numHashes)")
    }
  }

  test("single-row group: signature is the row's own permutation hashes") {
    val df = Seq((7L, 12345L)).toDF("doc_id", "__h")
    val got = df.groupBy($"doc_id")
      .agg(call_function("minhash_sig", $"__h", lit(8)).as("__sig"))
      .as[(Long, Seq[Long])].head()
    val expected = unrolledSig(df, 8).as[(Long, Seq[Long])].head()
    assert(got == expected)
  }

  test("null h folds like xxhash64's null child (seed passes through)") {
    val df = Seq((1L, Some(99L)), (1L, None), (2L, None))
      .toDF("doc_id", "__h")
    val got = df.groupBy($"doc_id")
      .agg(call_function("minhash_sig", $"__h", lit(4)).as("__sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val expected = unrolledSig(df, 4).as[(Long, Seq[Long])].collect().toMap
    assert(got == expected)
  }

  test("partition invariance: local[1]-style single partition equals wide") {
    val rows = Seq.fill(300)((Random.nextInt(10).toLong, Random.nextLong()))
    val one = rows.toDF("doc_id", "__h").coalesce(1)
    val wide = rows.toDF("doc_id", "__h").repartition(17)
    def sig(df: org.apache.spark.sql.DataFrame) = df.groupBy($"doc_id")
      .agg(call_function("minhash_sig", $"__h", lit(32)).as("__sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(one) == sig(wide))
  }

  test("sig_match_count: bit-exact vs the unrolled when/sum shape") {
    val rnd = new Random(7)
    // production-shaped signatures (always exactly numHashes elements —
    // the unrolled element_at oracle throws under ANSI past the length)
    // with planted agreements
    val rows = Seq.fill(200) {
      val a = Seq.fill(128)(rnd.nextLong() % 4)
      val b = a.map(v => if (rnd.nextBoolean()) v else rnd.nextLong() % 4)
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val numHashes = 128
    val terms = (1 to numHashes).map(i =>
      when(element_at($"a", i) === element_at($"b", i), 1).otherwise(0))
    val got = df.select(
        call_function("sig_match_count", $"a", $"b").as("c"),
        terms.reduce(_ + _).cast("long").as("e"))
      .as[(Long, Long)].collect()
    got.foreach { case (c, e) => assert(c == e) }
  }

  test("sig_match_count: null array or null elements contribute 0, never null") {
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (None: Option[Seq[Long]], None: Option[Seq[Long]]),
      (Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 9L))) // shorter right: pos 3 is no match
    ).toDF("a", "b")
    val got = df.select(call_function("sig_match_count", $"a", $"b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L))
  }

  test("signature pass compiles under codegen (no 64KB fallback) at 128 perms") {
    // the motivating regression: the unrolled shape at 128 permutations
    // logged "Code grows beyond 64 KB" and ran interpreted; the typed
    // aggregate's plan must be an ObjectHashAggregate (no wide-row agg)
    val df = Seq.fill(100)((Random.nextInt(5).toLong, Random.nextLong()))
      .toDF("doc_id", "__h")
    val plan = df.groupBy($"doc_id")
      .agg(call_function("minhash_sig", $"__h", lit(128)).as("__sig"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
  }
}
