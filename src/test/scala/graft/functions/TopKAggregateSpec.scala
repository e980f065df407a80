package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("property: aggregate equals sort-take-k on random data (30 trials)") {
    val rnd = new Random(1234)
    for (trial <- 0 until 30) {
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(12)
      val groups = 1 + rnd.nextInt(4)
      // duplicate distances on purpose: tie-breaking must be exercised
      val rows = Seq.fill(n)(
        (rnd.nextInt(groups).toLong, rnd.nextInt(20) / 4.0, rnd.nextInt(50).toLong))
      val df = rows.toDF("g", "d", "id").repartition(3 + rnd.nextInt(4))
      val got = df.groupBy($"g")
        .agg(call_function("topk_by_dist", $"d", $"id", lit(k)).as("topk"))
        .select($"g", explode($"topk").as("hit"))
        .select($"g", $"hit.dist", $"hit.id")
        .as[(Long, Double, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      val expected = rows.groupBy(_._1).view.mapValues(
        _.map(t => (t._2, t._3)).sorted.take(k)).toMap
      assert(got == expected, s"trial $trial (n=$n k=$k groups=$groups)")
    }
  }

  test("null dist or id rows are skipped, not ranked") {
    val df = Seq(
      (1L, Some(2.0), Some(20L)),
      (1L, None, Some(10L)),
      (1L, Some(1.0), None),
      (1L, Some(3.0), Some(30L))
    ).toDF("g", "d", "id")
    val got = df.groupBy($"g")
      .agg(call_function("topk_by_dist", $"d", $"id", lit(2)).as("topk"))
      .select(explode($"topk").as("hit")).select($"hit.id")
      .as[Long].collect().toSeq
    assert(got == Seq(20L, 30L))
  }
}
