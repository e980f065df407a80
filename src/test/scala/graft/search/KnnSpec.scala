package graft.search

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val index = {
    val rows = (0 until 40).map { i =>
      val v = Array.tabulate(4)(d => (i * (d + 1)).toFloat / 10f)
      (i.toLong, i % 3, v)
    }
    rows.toDF("chunk_id", "label", "embedding")
  }
  private val q = Array(0.5f, 1.0f, 1.5f, 2.0f)

  private def l2(a: Array[Float], b: Array[Float]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)

  test("distance expressions match scala reference computation") {
    val row = index.select(
      VectorFunctions.l2Distance($"embedding", typedlit(q)),
      VectorFunctions.dotProduct($"embedding", typedlit(q)),
      VectorFunctions.cosineSimilarity($"embedding", typedlit(q)))
      .where($"chunk_id" === 0 || true).collect()
    val vecs = index.select("embedding").as[Array[Float]].collect()
    row.zip(vecs).foreach { case (r, v) =>
      assert(math.abs(r.getDouble(0) - l2(v, q)) < 1e-12)
      val dot = v.zip(q).map { case (x, y) => x.toDouble * y }.sum
      assert(math.abs(r.getDouble(1) - dot) < 1e-12)
    }
  }

  test("cosine of zero vector is 0.0, not NaN") {
    val df = Seq((1L, Array(0f, 0f, 0f, 0f))).toDF("id", "v")
    val c = df.select(VectorFunctions.cosineSimilarity($"v", typedlit(q)))
      .head.getDouble(0)
    assert(c == 0.0)
  }

  test("topK returns min(k, n) rows sorted ascending by distance") {
    val hits = Knn.topKWithScore(index, q, 10)
      .select("chunk_id", "dist").as[(Long, Double)].collect().toSeq
    assert(hits.length == 10)
    assert(hits.map(_._2) == hits.map(_._2).sorted)
    val exact = index.select("chunk_id", "embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) => (id, l2(v, q)) }
      .sortBy { case (id, d) => (d, id) }.take(10)
    assert(hits.map(_._1).toSeq == exact.map(_._1).toSeq)
    assert(Knn.topKWithScore(index.limit(3), q, 10).count() == 3)
  }

  test("filtered search results all satisfy the predicate") {
    val hits = Knn.topKFiltered(index, q, 5, $"label" === 1)
    assert(hits.count() == 5)
    assert(hits.where($"label" =!= 1).count() == 0)
  }

  test("batch kNN matches per-query single kNN") {
    val queries = Seq(
      (100L, Array(0.1f, 0.2f, 0.3f, 0.4f)),
      (200L, Array(3.0f, 6.0f, 9.0f, 12.0f))
    ).toDF("query_id", "query_vec")
    val batch = Knn.topKBatch(queries, index, 4)
      .select("query_id", "chunk_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((qid, vec) <- Seq(100L -> Array(0.1f, 0.2f, 0.3f, 0.4f),
        200L -> Array(3.0f, 6.0f, 9.0f, 12.0f))) {
      val single = Knn.topK(index, vec, 4).select("chunk_id").as[Long].collect().toSet
      assert(batch(qid) == single, s"query $qid")
    }
  }

  test("aggregate batch kNN returns identical rows to the window formulation") {
    val queries = Seq(
      (100L, Array(0.1f, 0.2f, 0.3f, 0.4f)),
      (200L, Array(3.0f, 6.0f, 9.0f, 12.0f))
    ).toDF("query_id", "query_vec")
    val agg = Knn.topKBatch(queries, index, 5)
      .select("query_id", "rank", "chunk_id", "dist")
      .as[(Long, Int, Long, Double)].collect().toSet
    val win = Knn.topKBatchWindow(queries, index, 5)
      .select("query_id", "rank", "chunk_id", "dist")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(agg == win)
    assert(agg.size == 10)
  }

  test("aggregate batch kNN plan has no per-query full sort (partial agg present)") {
    val queries = Seq((1L, q)).toDF("query_id", "query_vec")
    val plan = Knn.topKBatch(queries, index, 3).queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by_dist") || plan.contains("ObjectHashAggregate"),
      s"expected partial aggregation in plan:\n$plan")
    assert(!plan.contains("Window"), s"window stage crept back in:\n$plan")
  }

  test("hierarchical returns at most fineK per section from coarse sections") {
    val hits = Knn.hierarchical(index, q, coarseK = 3, fineK = 2,
      sectionCol = "label")
    val bySection = hits.groupBy("label").count().as[(Int, Long)].collect().toMap
    assert(bySection.values.forall(_ <= 2))
  }

  test("normalizeScores sums to 100 per partition") {
    val hits = Knn.topKWithScore(index, q, 5)
    val total = Knn.normalizeScores(hits).agg(sum("importance_pct")).head.getDouble(0)
    assert(math.abs(total - 100.0) < 1e-9)
  }

  test("topk aggregate with k = 0 returns empty instead of crashing") {
    val queries = Seq((1L, q)).toDF("query_id", "query_vec")
    assert(Knn.topKBatch(queries, index, 0).count() == 0)
  }

  test("topKBatch rejects non-integral id columns instead of nulling them") {
    val strIndex = index.withColumn("chunk_id", $"chunk_id".cast("string"))
    val queries = Seq((1L, q)).toDF("query_id", "query_vec")
    val ex = intercept[IllegalArgumentException] {
      Knn.topKBatch(queries, strIndex, 3)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("exact distance ties break deterministically by id") {
    // 4 vectors all at identical distance from the query
    val tied = Seq(30L, 10L, 40L, 20L)
      .map(id => (id, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("chunk_id", "label", "embedding")
    val got = Knn.topKWithScore(tied, Array(0f, 0f, 0f, 0f), 3)
      .select("chunk_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 20L, 30L))
    // and the batch aggregate breaks ties the same way
    val queries = Seq((1L, Array(0f, 0f, 0f, 0f))).toDF("query_id", "query_vec")
    val batch = Knn.topKBatch(queries, tied, 3)
      .orderBy("rank").select("chunk_id").as[Long].collect().toSeq
    assert(batch == Seq(10L, 20L, 30L))
  }

  test("dimension mismatch raises rather than truncating") {
    val ex = intercept[Exception] {
      index.select(VectorFunctions.l2Distance($"embedding",
        typedlit(Array(1f, 2f)))).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch")
      || ex.getCause != null && ex.getCause.getMessage.contains("dimension mismatch"))
  }
}
