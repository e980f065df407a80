package graft.functions

import graft.GraftExtensions
import graft.search.Knn
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class WindowTopKRewriteSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("topk-rewrite-test")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(spark)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  private def fixtures(spark: SparkSession) = {
    import spark.implicits._
    val index = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(d => (i * (d + 1)).toFloat / 10f))
    }.toDF("chunk_id", "embedding")
    val queries = Seq(
      (100L, Array(0.1f, 0.2f, 0.3f, 0.4f)),
      (200L, Array(3.0f, 6.0f, 9.0f, 12.0f))
    ).toDF("query_id", "query_vec")
    (index, queries)
  }

  test("rule rewrites the window formulation into the top-k aggregate") {
    withExtSession { spark =>
      spark.conf.set("spark.graft.rewriteWindowTopK", "true")
      val (index, queries) = fixtures(spark)
      val win = Knn.topKBatchWindow(queries, index, 5)
        .select("query_id", "rank", "chunk_id", "dist")
      val plan = win.queryExecution.executedPlan.toString
      assert(plan.contains("topk_by_dist"), s"rule did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window survived:\n$plan")
      // and the rewritten results equal the aggregate formulation's
      import spark.implicits._
      val got = win.as[(Long, Int, Long, Double)].collect().toSet
      val expected = Knn.topKBatch(queries, index, 5)
        .select("query_id", "rank", "chunk_id", "dist")
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(got == expected)
      assert(got.size == 10)
    }
  }

  test("rule is off by default and bails on non-matching shapes") {
    withExtSession { spark =>
      val (index, queries) = fixtures(spark)
      // conf unset: window plan untouched
      val plan1 = Knn.topKBatchWindow(queries, index, 5)
        .select("query_id", "rank", "chunk_id", "dist")
        .queryExecution.executedPlan.toString
      assert(plan1.contains("Window"))

      spark.conf.set("spark.graft.rewriteWindowTopK", "true")
      // projecting a column outside (part, dist, id, rank) must bail
      val wide = Knn.topKBatchWindow(queries, index, 5)
        .select("query_id", "rank", "chunk_id", "dist", "query_vec")
      val plan2 = wide.queryExecution.executedPlan.toString
      assert(plan2.contains("Window"), s"rule fired on unsupported shape:\n$plan2")
      assert(wide.count() == 10)
    }
  }
}
