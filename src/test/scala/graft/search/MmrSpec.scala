package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight clusters + one outlier, so relevance-only top-3 and
    * MMR top-3 are provably different sets.
    *   ids 0,1,2: near (1,0)     — highest relevance to q=(1,0)
    *   ids 10,11: near (0.8,0.6) — relevant but a distinct direction
    *   id 20:     (0,1)          — orthogonal-ish outlier
    */
  private lazy val index = Seq(
    (0L, Array(1.00f, 0.00f)),
    (1L, Array(0.99f, 0.02f)),
    (2L, Array(0.98f, 0.04f)),
    (10L, Array(0.80f, 0.60f)),
    (11L, Array(0.79f, 0.61f)),
    (20L, Array(0.00f, 1.00f))
  ).toDF("chunk_id", "embedding")

  private def queries(v: Array[Float]) =
    Seq((7L, v)).toDF("query_id", "query_vec")

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plain-Scala reference MMR over the full index (fetchK = n). */
  private def refMmr(
      q: Array[Float],
      docs: Seq[(Long, Array[Float])],
      k: Int,
      lam: Double): Seq[(Long, Double)] = {
    var remaining = docs.map { case (id, v) => (id, v, cos(v, q)) }
    var selected = Vector.empty[(Long, Array[Float], Double)]
    var out = Vector.empty[(Long, Double)]
    while (out.length < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, v, rel) =>
        val div = if (selected.isEmpty) 0.0
          else selected.map(s => cos(v, s._2)).max
        (id, v, rel, lam * rel - (1.0 - lam) * div)
      }
      val best = scored.minBy { case (id, _, _, s) => (-s, id) }
      selected :+= ((best._1, best._2, best._3))
      remaining = remaining.filterNot(_._1 == best._1)
      out :+= ((best._1, best._4))
    }
    out
  }

  test("matches the plain-Scala greedy reference (fetchK = n)") {
    val q = Array(1.0f, 0.0f)
    val docs = index.as[(Long, Array[Float])].collect().toSeq
    val expected = refMmr(q, docs, k = 3, lam = 0.5)
    val got = Mmr.mmrTopKBatch(queries(q), index, k = 3, fetchK = 6)
      .orderBy("rank")
      .select("chunk_id", "mmr_score").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-12)
    }
  }

  test("diversifies: lambda 0.5 set differs from relevance-only lambda 1.0") {
    // a query BETWEEN the two clusters (not equal to any doc — a query
    // equal to a stored vector degenerates stage-2 scores to an all-zero
    // tie): relevance-only top-3 takes both B-cluster mates plus one A;
    // at lambda 0.5 the B mate's near-1 similarity to the first pick
    // evicts it for a second A
    val q = Array(0.92f, 0.39f)
    val rel = Mmr.mmrTopKBatch(queries(q), index, k = 3, fetchK = 6,
      lambdaMult = 1.0)
      .orderBy("rank").select("chunk_id").as[Long].collect().toSeq
    val div = Mmr.mmrTopKBatch(queries(q), index, k = 3, fetchK = 6,
      lambdaMult = 0.5)
      .orderBy("rank").select("chunk_id").as[Long].collect().toSeq
    assert(rel.head == div.head, "the first pick is pure relevance")
    assert(rel.toSet != div.toSet,
      s"diversity must change the set: rel=$rel div=$div")
    // and both match the plain-Scala greedy
    val docs = index.as[(Long, Array[Float])].collect().toSeq
    assert(div == refMmr(q, docs, 3, 0.5).map(_._1))
    assert(rel == refMmr(q, docs, 3, 1.0).map(_._1))
  }

  test("lambda 1.0 degenerates to relevance order over the fetched pool") {
    val q = Array(1.0f, 0.0f)
    val got = Mmr.mmrTopKBatch(queries(q), index, k = 4, fetchK = 6,
      lambdaMult = 1.0)
      .orderBy("rank").select("chunk_id").as[Long].collect().toSeq
    val relOrder = index.as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1).toSeq
    assert(got == relOrder)
  }

  test("rank 1 is the max-relevance candidate; its score is lambda*rel") {
    val q = Array(1.0f, 0.0f)
    val first = Mmr.mmrTopKBatch(queries(q), index, k = 1, fetchK = 6,
      lambdaMult = 0.25)
      .select("chunk_id", "mmr_score").as[(Long, Double)].head()
    assert(first._1 == 0L)
    val rel = cos(Array(1.00f, 0.00f), q)
    assert(math.abs(first._2 - 0.25 * rel) < 1e-12)
  }

  test("short pool: emits min(k, candidates) rows") {
    val q = Array(1.0f, 0.0f)
    val small = index.where($"chunk_id" < 2)
    val got = Mmr.mmrTopKBatch(queries(q), small, k = 5, fetchK = 8)
    assert(got.count() == 2)
  }

  test("batch independence: each query gets its own greedy selection") {
    val qs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("query_id", "query_vec")
    val got = Mmr.mmrTopKBatch(qs, index, k = 2, fetchK = 6)
      .orderBy("query_id", "rank")
      .select("query_id", "chunk_id").as[(Long, Long)].collect().toSeq
    val docs = index.as[(Long, Array[Float])].collect().toSeq
    val e1 = refMmr(Array(1.0f, 0.0f), docs, 2, 0.5).map(_._1)
    val e2 = refMmr(Array(0.0f, 1.0f), docs, 2, 0.5).map(_._1)
    assert(got.filter(_._1 == 1L).map(_._2) == e1)
    assert(got.filter(_._1 == 2L).map(_._2) == e2)
  }

  test("approx route: greedy law holds over whatever pool the bands recall") {
    // the banded fetch may recall fewer candidates (that is its contract);
    // the MMR stage must be fetch-agnostic — its selection over the approx
    // route equals the plain-Scala greedy over the pool the bands returned
    val q = Array(1.0f, 0.0f)
    val pool = graft.ops.Ann.rpTopKBatch(queries(q), index, 6,
      idCol = "chunk_id", vecCol = "embedding")
      .select("chunk_id").as[Long].collect().toSet
    assert(pool.contains(0L), "an identical vector collides in every band")
    val docs = index.as[(Long, Array[Float])].collect().toSeq
      .filter(d => pool.contains(d._1))
    val expected = refMmr(q, docs, k = 3, lam = 0.5).map(_._1)
    val banded = Mmr.mmrTopKBatch(queries(q), index, k = 3, fetchK = 6,
      approx = true)
      .orderBy("rank").select("chunk_id").as[Long].collect().toSeq
    assert(banded == expected)
  }

  test("negative similarity to the selected set is a bonus, not a 0 clamp") {
    // true MMR maxes the RAW cosines to the selected set — for an
    // anti-correlated candidate that max is negative and RAISES the
    // score (LangChain's maximal_marginal_relevance does the same).
    // Here pick 1 is id 0; id 30 (sim to 0 = −0.2, rel 0.4277) must
    // beat id 2 (sim 0.0, rel 0.6): unclamped 0.3139 > 0.3, while a
    // 0-floored running max would score it 0.2139 and pick id 2
    val idx = Seq(
      (0L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (30L, Array(-0.2f, 0.98f))).toDF("chunk_id", "embedding")
    val q = Array(0.8f, 0.6f)
    val got = Mmr.mmrTopKBatch(queries(q), idx, k = 2, fetchK = 3)
      .orderBy("rank").select("chunk_id").as[Long].collect().toSeq
    assert(got == Seq(0L, 30L))
    val docs = idx.as[(Long, Array[Float])].collect().toSeq
    assert(got == refMmr(q, docs, 2, 0.5).map(_._1))
  }

  test("duplicate index ids never occupy two ranks") {
    // a doubled row (replayed append, producer bug) multiplies candidate
    // rows through the vector re-join; the greedy's taken() is per
    // array-slot, so without the (qid, cid) dedup id 0 could be selected
    // at ranks 1 AND 2 (ADVICE r12)
    val dup = index.unionByName(
      Seq((0L, Array(1.00f, 0.00f))).toDF("chunk_id", "embedding"))
    val got = Mmr.mmrTopKBatch(queries(Array(1.0f, 0.0f)), dup, k = 3, fetchK = 6)
      .orderBy("rank").select("chunk_id").as[Long].collect().toSeq
    assert(got.distinct == got, s"id repeated across ranks: $got")
    // and the selection matches the clean index's
    val clean = Mmr.mmrTopKBatch(queries(Array(1.0f, 0.0f)), index, k = 3, fetchK = 6)
      .orderBy("rank").select("chunk_id").as[Long].collect().toSeq
    assert(got == clean)
  }

  test("banded fetch route: recall floor on the sf0.01 fixture (the a16 audit's law)") {
    // the q11b/a16 pins are hash-level regression detectors; the QUALITY
    // floor lives here — the 8x3 serving-default banding must recall at
    // least half of the exact top-8 on the fixture's embeddings
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val qs = emb.where(col("vec_id").isin(3, 7, 11))
      .select(col("vec_id").as("query_id"),
        reverse(col("embedding")).as("query_vec"))
    val truth = Knn.topKBatch(qs, emb, 8, idCol = "vec_id")
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val approx = graft.ops.Ann.rpTopKBatch(qs, emb, 8)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).count(t).toDouble / t.size
    }.toSeq
    assert(recalls.nonEmpty && recalls.sum / recalls.size >= 0.5,
      s"banded fetch recall collapsed: $recalls")
  }

  test("refuses bad knobs loudly") {
    val q = queries(Array(1.0f, 0.0f))
    intercept[IllegalArgumentException] {
      Mmr.mmrTopKBatch(q, index, k = 0)
    }
    intercept[IllegalArgumentException] {
      Mmr.mmrTopKBatch(q, index, k = 5, fetchK = 4)
    }
    intercept[IllegalArgumentException] {
      Mmr.mmrTopKBatch(q, index, k = 2, fetchK = 6, lambdaMult = 1.5)
    }
    intercept[IllegalArgumentException] {
      Mmr.mmrTopKBatch(q, index, k = 2, fetchK = 9999)
    }
    // a string query id would cast to null and collapse every query
    // into one greedy group — refuse at the door
    intercept[IllegalArgumentException] {
      Mmr.mmrTopKBatch(
        Seq(("q1", Array(1.0f, 0.0f))).toDF("query_id", "query_vec"),
        index, k = 2)
    }
  }
}
