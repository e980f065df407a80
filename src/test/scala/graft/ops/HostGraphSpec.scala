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

  // -------------------------------------------------------- TrustRank

  private def trusts(edges: Seq[(Long, Long)], seeds: Seq[Long]): Map[Long, Long] =
    HostGraph.trustRank(edges.toDF("src", "dst"), seeds.toDF("node"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("trustRank: mass decays with link distance from the seed") {
    // seed 1 -> chain 1->2->3->4; isolated spam clique 10<->11 linking
    // only to itself scores 0 despite its internal density
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L))
    val t = trusts(edges, Seq(1L))
    assert(t(1L) > t(2L) && t(2L) > t(3L) && t(3L) > t(4L))
    assert(t(10L) == 0L && t(11L) == 0L,
      s"unreachable spam clique must hold zero trust, got $t")
  }

  test("trustRank with all nodes as seeds reproduces pageRank ordering") {
    val edges = (0L until 200L).map(i => (i % 23, (i * 7 + 3) % 23))
    val pr = HostGraph.pageRank(edges.toDF("src", "dst"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tr = trusts(edges, (0L until 23L).toSeq)
    def order(m: Map[Long, Long]) = m.toSeq.sortBy { case (n, r) => (-r, n) }.map(_._1)
    assert(order(pr) == order(tr),
      "uniform seeds must recover the PageRank ordering")
  }

  test("trustRank: exactly partition-invariant; seeds outside the graph ignored") {
    val edges = (0L until 200L).map(i => (i % 23, (i * 7 + 3) % 23))
    val seeds = Seq(0L, 5L, 999L) // 999 not in the graph
    val a = HostGraph.trustRank(
      edges.toDF("src", "dst").repartition(13), seeds.toDF("node"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = HostGraph.trustRank(
      edges.toDF("src", "dst").coalesce(1), seeds.toDF("node"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      HostGraph.trustRank(
        edges.toDF("src", "dst"), Seq(999L).toDF("node"), 5)
    }
  }

  // ------------------------------------------------------------- HITS

  private def hubsAuths(edges: Seq[(Long, Long)], iters: Int = 8)
      : Map[Long, (Long, Long)] =
    HostGraph.hits(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("hits: planted authority tops auth, planted hub tops hub") {
    // node 0 points at everything (pure hub); node 9 is pointed at by
    // everything (pure authority); 1-8 form a weak ring
    val edges = (1L to 8L).map(i => (0L, i)) ++
      (1L to 8L).map(i => (i, 9L)) ++
      (1L to 8L).map(i => (i, if (i == 8L) 1L else i + 1))
    val m = hubsAuths(edges)
    val topAuth = m.maxBy { case (n, (_, a)) => (a, -n) }._1
    val topHub = m.maxBy { case (n, (h, _)) => (h, -n) }._1
    assert(topAuth == 9L, s"expected node 9 top authority, got $m")
    assert(topHub == 0L, s"expected node 0 top hub, got $m")
    // 9 has no out-links: its hub score must be 0; 0 has no in-links
    assert(m(9L)._1 == 0L && m(0L)._2 == 0L)
  }

  test("hits: L-infinity grid law — every round's max lands exactly on scale") {
    val m = hubsAuths(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)))
    assert(m.values.map(_._1).max == 1000000L)
    assert(m.values.map(_._2).max == 1000000L)
  }

  test("hits: exactly partition-invariant (integer-grid law)") {
    val edges = (0L until 300L).map(i => (i % 29, (i * 11 + 5) % 29))
    val a = HostGraph.hits(edges.toDF("src", "dst").repartition(13), 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val b = HostGraph.hits(edges.toDF("src", "dst").coalesce(1), 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a == b)
  }

  test("hits: guards refuse empty graphs and bad scales loudly") {
    intercept[IllegalArgumentException] {
      HostGraph.hits(Seq.empty[(Long, Long)].toDF("src", "dst"))
    }
    intercept[IllegalArgumentException] {
      HostGraph.hits(Seq((1L, 2L)).toDF("src", "dst"), scale = 0)
    }
    // overflow guard: n·scale² must fit a Long (the L∞ rescale multiplies
    // raw ≤ n·scale by scale) — at scale=4e9 even 2 nodes overflow, and
    // the operator must refuse rather than wrap negative
    val e = intercept[IllegalArgumentException] {
      HostGraph.hits(Seq((1L, 2L)).toDF("src", "dst"), scale = 4000000000L)
    }
    assert(e.getMessage.contains("smaller scale"))
  }
}
