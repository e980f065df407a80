package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph authority ranking: PageRank (Page et al. 1999) over a
  * domain/host link graph — the crawl-curation prior web-scale corpora
  * gate on (a link-farm domain has volume; it does not have authority,
  * so rank-based caps beat count-based caps in [[UrlCuration]]).
  *
  * All mass arithmetic runs on a fixed integer grid (`scale`) with
  * explicit floor division, so every iteration is exact integer algebra:
  * associative, partition-invariant, and reproducible bit-for-bit by any
  * engine — the same determinism recipe as DSIR / BM25 / the bigram LM.
  *
  * Scale shape: each iteration is one shuffle join of the node-sized rank
  * table onto edges (keyed by src — pre-partitioning edges by src lets
  * every iteration reuse that exchange) plus one aggregate keyed by dst.
  * Nothing driver-side but the node count; iteration state is freed per
  * round (localCheckpoint + explicit block release) so lineage and
  * executor storage stay O(1) in the iteration count.
  */
object HostGraph {

  /** Integer-grid PageRank.
    *
    * Per iteration, with damping d = `dampingPct`/100 and N nodes:
    * {{{
    *   contrib(u→v) = (dampingPct * rank(u)) div (100 * outdeg(u))
    *   rank'(v)     = base + Σ contrib(u→v),
    *   base         = ((100 - dampingPct) * scale) div (100 * N)
    * }}}
    * Self-loops and duplicate edges are dropped. Dangling nodes (no
    * out-edges) leak their damped mass — the standard simplification when
    * the output is an authority ORDER rather than a probability
    * distribution; ranks still converge and compare.
    */
  def pageRank(
      edges0: DataFrame,
      iterations: Int = 10,
      dampingPct: Int = 85,
      scale: Long = 1000000000000L,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(dampingPct > 0 && dampingPct < 100,
      s"dampingPct must be in (0, 100), got $dampingPct")
    def freeCkpt(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    val edges = prepEdges(edges0, srcCol, dstCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .distinct()
        .localCheckpoint(true)
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      // the only driver-side state: one long
      val n = nodes.count()
      require(n > 0, "pageRank on an empty graph")
      val base = ((100L - dampingPct) * scale) / (100L * n)
      var ranks = nodes.withColumn("rank_scaled", lit(scale / n))
        .localCheckpoint(true)
      for (_ <- 1 to iterations) {
        val next = iterationStep(edges, nodes, outdeg, ranks, base, dampingPct)
          .localCheckpoint(true)
        freeCkpt(ranks)
        ranks = next
      }
      // the returned frame is itself a checkpoint — the loop scaffolding's
      // blocks can go now
      freeCkpt(nodes)
      freeCkpt(outdeg)
      ranks
    } finally edges.unpersist()
  }

  /** Edge normalization for [[pageRank]]: cast, drop self-loops, dedup —
    * then one explicit src repartition. distinct() alone leaves the edges
    * hash-partitioned on (src, dst), which does NOT satisfy the
    * per-iteration join's src distribution, so every round would
    * re-exchange the full edge set; partitioned by src, the cached layout
    * satisfies all `iterations` joins and per-round shuffle cost is
    * rank-table-sized. Pinned in ExplainAudit (one-iteration plan has no
    * edge-side Exchange).
    */
  private[graft] def prepEdges(
      edges0: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))

  /** One PageRank round (pre-checkpoint) — factored out so the plan shape
    * of an iteration is auditable in isolation.
    */
  private[graft] def iterationStep(
      edges: DataFrame,
      nodes: DataFrame,
      outdeg: DataFrame,
      ranks: DataFrame,
      base: Long,
      dampingPct: Int): DataFrame = {
    val inMass = edges
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .join(outdeg, "src")
      .select(col("dst").as("node"),
        expr(s"($dampingPct * rank_scaled) div (100 * deg)").as("contrib"))
      .groupBy("node")
      .agg(sum(col("contrib")).as("in_mass"))
    nodes
      .join(inMass, Seq("node"), "left")
      .select(col("node"),
        (lit(base) + coalesce(col("in_mass"), lit(0L))).as("rank_scaled"))
  }
}
