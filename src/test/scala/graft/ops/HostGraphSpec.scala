package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HostGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 10): Map[Long, Long] =
    HostGraph.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("symmetric 2-cycle splits mass equally") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)))
    assert(r(1L) == r(2L))
    // closed graph, integer floors only lose O(iterations) units of 1e12
    assert(r.values.sum > 999999000000L && r.values.sum <= 1000000000000L)
  }

  test("star hub out-ranks its leaves and ordering is strict") {
    // leaves 1..4 all point at hub 0; hub points back at leaf 1. The
    // hub↔leaf1 exchange oscillates at rate d^k, so run enough iterations
    // for the fixed-point gap (hub ≈ 0.476 vs leaf1 ≈ 0.434) to dominate
    val r = ranks(Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)), iters = 30)
    assert(r(0L) > r(1L), "hub must dominate")
    assert(r(1L) > r(2L), "leaf with hub backlink must beat plain leaves")
    assert(r(2L) == r(3L) && r(3L) == r(4L), "symmetric leaves tie exactly")
  }

  test("chain: authority accumulates downstream") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    // 4 is a dangling sink — it receives 3's damped mass, which received
    // 2's, so rank grows monotonically along the chain prefix
    assert(r(1L) < r(2L) && r(2L) < r(3L))
  }

  test("self-loops and duplicate edges do not distort ranks") {
    val clean = ranks(Seq((1L, 2L), (2L, 1L)))
    val noisy = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L)))
    assert(clean == noisy)
  }

  test("ranks are exactly partition-invariant (integer-grid law)") {
    val edges = (0L until 200L).map(i => (i % 23, (i * 7 + 3) % 23))
    val a = HostGraph.pageRank(edges.toDF("src", "dst").repartition(13), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = HostGraph.pageRank(edges.toDF("src", "dst").coalesce(1), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("guards: empty graph and bad damping refuse loudly") {
    intercept[IllegalArgumentException] {
      HostGraph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"), 5)
    }
    intercept[IllegalArgumentException] {
      HostGraph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), 5, dampingPct = 100)
    }
  }
}
