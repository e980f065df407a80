package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan audits for the scale-critical queries: verifies (by string probe
  * on the executed plan) that the physical shape is the one a 100 TB run
  * needs — pushdown at the scan, broadcast on dimension joins, partial
  * aggregation, no stray global windows/sorts. Prints PASS/FAIL per probe
  * plus the formatted plan on failure.
  * Usage: sbt "runMain graft.tools.ExplainAudit [sfDir]"
  */
object ExplainAudit {

  /** An Exchange re-shuffles a CACHED table only if the cache scan sits
    * below it through narrow (1-child, non-aggregate) operators — an
    * Exchange above a join or aggregate moves derived rows, which is the
    * intended per-iteration cost in the graph loops.
    */
  private def narrowPathToCache(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
    p match {
      case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        true
      case x if x.children.length != 1 => false
      case x if x.getClass.getSimpleName.contains("Aggregate") => false
      case x => narrowPathToCache(x.children.head)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = SparkEntry.queries
    var failed = 0

    def audit(name: String)(checks: (String, String => Boolean)*): Unit = {
      val df = qs(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      checks.foreach { case (desc, p) =>
        val ok = p(plan)
        if (!ok) {
          failed += 1
          println(s"FAIL $name: $desc")
          println(plan.linesIterator.take(60).mkString("\n"))
        } else println(s"PASS $name: $desc")
      }
    }

    audit("q3_knn_filtered")(
      "label filter pushed to parquet scan" ->
        (p => p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]")),
      "TakeOrderedAndProject (per-partition k-heap), no full sort" ->
        (p => p.contains("TakeOrderedAndProject")))
    audit("q1_knn_top4")(
      "TakeOrderedAndProject" -> (p => p.contains("TakeOrderedAndProject")),
      "column pruning through the top-k (label never read)" ->
        (p => p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>")))
    audit("q1b_knn_batch")(
      "no window stage" -> (p => !p.contains("Window")),
      "broadcast queries side" -> (p => p.contains("BroadcastNestedLoopJoin")
        || p.contains("BroadcastExchange")),
      "partial top-k aggregate" -> (p => p.contains("partial_topk_by_dist")))
    audit("s9_warc_ingest")(
      "write arm is one keyed MapGroups" -> (p => p.contains("MapGroups")),
      "roundtrip has no join" -> (p => !p.contains("Join")),
      "and no window" -> (p => !p.contains("Window")))
    audit("q11_mmr_rerank")(
      "candidate fetch via the bounded-heap aggregate (no window sort)" ->
        (p => p.contains("partial_topk_by_dist")),
      "greedy stage is MapGroups (one query-keyed group pass)" ->
        (p => p.contains("MapGroups")),
      "no Window stage anywhere in the composed plan" ->
        (p => !p.contains("Window")))
    audit("r2_shipping_priority")(
      "customer broadcast, not shuffled" -> (p => p.contains("BroadcastHashJoin")),
      "segment filter pushed" -> (p => p.contains("EqualTo(c_mktsegment,BUILDING)")))
    audit("r3_regional_revenue")(
      "dimension chain broadcast" ->
        (p => "BroadcastHashJoin".r.findAllIn(p).size >= 4))
    audit("r7_anti_join")(
      "anti join stays hash-based" ->
        (p => p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")))
    audit("x1_token_counts")(
      "projection pruned to needed columns" ->
        (p => p.contains("ReadSchema: struct<doc_id:bigint,text:string>")))
    audit("d3_jaccard_pairs")(
      "doc_id range filter pushed" ->
        (p => p.contains("LessThan(doc_id,60)")))
    audit("t4_chunks")(
      "native generator, no UDF array materialization" ->
        (p => p.contains("recursivesplitgenerator") && !p.contains("UDF(")))
    audit("st1_tumbling")(
      "single aggregate, no sort before it" ->
        (p => p.contains("HashAggregate")))
    audit("st17_distribution_drift")(
      "grid completion and PSI joins all broadcast (windows × bins is tiny)" ->
        (p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")),
      "no all-pairs degradation on the grid cross join" ->
        (p => !p.contains("CartesianProduct")),
      "events shuffled once into (window, bin) counts (partial agg)" ->
        (p => p.contains("HashAggregate")))
    audit("p21_cluster_sample")(
      "quota rank runs as WindowGroupLimit (per-cluster k-heap, not a full rank)" ->
        (p => p.contains("WindowGroupLimit")),
      "cluster assignment reaches the rank through ONE cluster-keyed exchange" ->
        (p => "Exchange hashpartitioning\\(centroid_id".r.findAllIn(p).size == 1))
    audit("b11_bm25f_fielded")(
      "query-idf and scoring joins broadcast (query side tiny)" ->
        (p => p.contains("BroadcastHashJoin")),
      "single field-tagged tf pivot, no Window in the build" ->
        (p => !p.contains("WindowExec") && p.contains("HashAggregate")))
    audit("b11b_bm25f_at_rest")(
      // the postings scans + dl joins live BEHIND the grid's materializeOnce
      // (they run once, eagerly, at probe construction); the final plan is
      // scorer-only: checkpoint scan + broadcast idf join + heap
      "scorer reads the checkpointed grid, not files" ->
        (p => p.contains("ExistingRDD") && !p.contains("FileScan")),
      "query-idf join broadcast" -> (p => p.contains("BroadcastHashJoin")),
      "no cartesian anywhere in the composition" ->
        (p => !p.contains("CartesianProduct")))
    audit("c10_semantic_cache")(
      "cache side broadcast (BNLJ over the broadcast cache, never shuffled)" ->
        (p => p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange")),
      "codegen cosine in the scan (no UDF in the scoring loop)" ->
        (p => p.contains("cosine_similarity") && !p.contains("UDF(")))
    audit("c10b_semantic_cache_banded")(
      "band-bucket candidate join is broadcast-hash (cache never reshuffled per batch)" ->
        (p => p.contains("BroadcastHashJoin")),
      "no all-pairs degradation on the banded path" ->
        (p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      "normalize is the codegen unit_vector_f, no UDF anywhere" ->
        (p => p.contains("unit_vector_f") && !p.contains("UDF(")))
    audit("ep5_cached_rag")(
      // the final plan is the composed serving loop's TAIL: the lookup
      // dispositions, miss pipeline, and intake all run behind
      // checkpoints at construction (their shapes are audited standalone
      // — c10's codegen cosine, b5/b11b's pruned postings, b9's rerank),
      // so what remains is checkpoint scans + the store answer joins
      "dispositions and priced answers read from checkpoints, no UDF in the serving tail" ->
        (p => p.contains("ExistingRDD") && !p.contains("UDF(")),
      "no shuffled cartesian in the composed serving loop" ->
        (p => !p.contains("CartesianProduct")),
      "answer serving joins are broadcast (store is the working set)" ->
        (p => p.contains("BroadcastHashJoin")),
      // round-11 verdict #2: the hit-answer fetch must push the
      // micro-batch-bounded hit ids into the post-intake store SCAN (the
      // b11b term-set discipline) — without it the join shuffles the
      // full store per micro-batch at banded scale
      "hit-answer fetch pushes cache_id IN (...) into the store scan" ->
        (p => p.contains("In(cache_id") || p.contains("EqualTo(cache_id")))
    audit("ep6_chat_rag")(
      // the chat composition's heavy stages (lookup, miss pipeline,
      // intake, prompt counting) all run behind checkpoints at
      // construction; the registered tail is checkpoint scans + the
      // final projection
      "chat tail reads checkpoints, no UDF anywhere" ->
        (p => p.contains("ExistingRDD") && !p.contains("UDF(")),
      "no cartesian in the chat composition" ->
        (p => !p.contains("CartesianProduct")))
    audit("c13_cache_report")(
      "one hash aggregate over the dispositions (map-side partials)" ->
        (p => p.contains("HashAggregate")),
      "mint-cost join broadcast (cache-bounded build side)" ->
        (p => p.contains("BroadcastHashJoin")),
      "no cartesian in the report" -> (p => !p.contains("CartesianProduct")),
      "the underlying hit fetches carry the IN pushdown" ->
        (p => p.contains("In(cache_id") || p.contains("EqualTo(cache_id")))
    audit("a4_lsh_batch")(
      "band-bucket candidate join is broadcast-hash" ->
        (p => p.contains("BroadcastHashJoin")),
      "no all-pairs degradation" ->
        (p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      "partial top-k aggregate" -> (p => p.contains("partial_topk_by_dist")))
    audit("a5_ivf_batch")(
      "candidates via broadcast-hash join on centroid_id" ->
        (p => p.contains("BroadcastHashJoin")),
      "partial top-k aggregate" -> (p => p.contains("partial_topk_by_dist")))
    audit("st7_attribution")(
      "interval join keyed on user, never cartesian" ->
        (p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("d8_cosine_pairs_auto")(
      "small input resolves to the exact broadcast path" ->
        (p => p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin")))
    audit("a7_pq_batch")(
      "ADC scoring finishes in the bounded-heap aggregate" ->
        (p => p.contains("topk_by_dist")),
      "no shuffled cartesian anywhere in the PQ path" ->
        (p => !p.contains("CartesianProduct")))
    audit("a8_ivfpq_batch")(
      "IVF list membership is an equi-join on centroid_id" ->
        (p => p.contains("centroid_id")),
      "no shuffled cartesian in the composed IVFPQ path" ->
        (p => !p.contains("CartesianProduct")))
    audit("p22_hard_negatives")(
      "candidate fetch is the partial top-k heap (corpus never shuffles wholesale)" ->
        (p => p.contains("partial_topk_by_dist")),
      "queries broadcast into the scored scan" ->
        (p => p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange")),
      "the dense re-rank runs as a group-limited window over the bounded prefix" ->
        (p => p.contains("WindowGroupLimit")))
    audit("p4_source_mixture")(
      "quota table is the broadcast side" ->
        (p => p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange")),
      "only doc_id + stratum read from the corpus scan" ->
        (p => p.contains("ReadSchema: struct<doc_id:bigint,source:string>")))
    audit("p5_hash_split")(
      "split assignment is pure column algebra: single exchange (the " +
        "2-group count), no join" ->
        (p => !p.contains("Join") && p.linesIterator.count(_.contains("Exchange")) <= 2))
    audit("p7_seq_packing")(
      "one window per group tape, fed by a partition-local sort" ->
        (p => p.linesIterator.count(_.contains("Window [")) == 1 &&
          p.linesIterator.exists(l => l.contains("Sort [") &&
            l.contains("doc_id") && l.contains("], false, 0"))),
      "packing reads only the columns it needs" ->
        (p => p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>")))
    audit("p3b_stratified_sample_large")(
      // Catalyst folds the md5-prefix threshold into the broadcast-join
      // condition itself (no standalone Filter node) — the compare just
      // has to be planned upstream of the window
      "md5-prefix threshold compare planned before the rank window" ->
        (p => p.linesIterator.exists(l =>
          l.contains("substring(md5") && l.contains("__th"))),
      "quota/threshold table joined broadcast" ->
        (p => p.contains("BroadcastHashJoin")),
      "rank truncated map-side (WindowGroupLimit Partial)" ->
        (p => p.contains("WindowGroupLimit") && p.contains("Partial")))
    audit("p8_shard_manifest")(
      "manifest is one partial-aggregated pass" ->
        (p => p.contains("partial_count") || p.contains("HashAggregate")),
      "no join anywhere in the manifest plan" ->
        (p => !p.contains("Join")))
    audit("d12_decontamination")(
      "train grams stream through a broadcast hash join (eval side built)" ->
        (p => p.contains("BroadcastHashJoin")),
      "no cartesian in the contamination path" ->
        (p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("d15_incremental_dedup")(
      "corpus-side Bloom probe is Catalyst's native expression, not a UDF" ->
        (p => p.contains("might_contain") && !p.contains("UDF(")),
      "bloom prefilter sits on the corpus scan, before any exchange" ->
        (p => p.linesIterator.exists(l =>
          l.contains("Filter") && l.contains("might_contain"))),
      "anti join on the md5 digest stays hash-based" ->
        (p => (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
          && !p.contains("CartesianProduct")))
    audit("b10_bm25_seg_merge")(
      "merged-index probe still statically prunes to the query terms' buckets" ->
        (p => p.linesIterator.exists(l =>
          l.contains("PartitionFilters:") && l.contains("bucket#"))),
      "probe joins broadcast over the pruned postings" ->
        (p => p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct")),
      "per-query top-k is a partial heap aggregate" ->
        (p => p.contains("partial_topk_by_dist")))
    audit("p9_dsir_weights")(
      // the ≤nBuckets-row ratio model is the broadcast side; the raw
      // corpus's feature stream never re-shuffles for the join
      "bucket ratio model joined broadcast" ->
        (p => p.contains("BroadcastHashJoin")),
      "no shuffled cartesian (the 1-row totals join is the only nested loop)" ->
        (p => !p.contains("CartesianProduct")))
    audit("p11_epoch_mixture")(
      "epoch quota table joined broadcast" ->
        (p => p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange")),
      "pure per-row expansion: no window, no aggregate" ->
        (p => !p.contains("Window") && !p.contains("HashAggregate")))
    audit("b1_bm25_topk")(
      "query-term idf table broadcast to the postings scan" ->
        (p => p.contains("BroadcastHashJoin")),
      "no cartesian in the term-pruned probe" ->
        (p => !p.contains("CartesianProduct")),
      "per-query top-k is a partial heap aggregate" ->
        (p => p.contains("partial_topk_by_dist")),
      "index build: dl from size(tokens), no doc-partitioned window" ->
        (p => !p.contains("Window [")))
    audit("b5_bm25_at_rest")(
      "postings scan statically pruned to the query terms' buckets" ->
        (p => p.linesIterator.exists(l =>
          l.contains("PartitionFilters:") && l.contains("bucket#"))),
      "probe joins broadcast, never corpus-shuffled" ->
        (p => p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct")),
      "per-query top-k is a partial heap aggregate" ->
        (p => p.contains("partial_topk_by_dist")))
    audit("b4_bm25_prf")(
      "both scoring passes broadcast the term tables" ->
        (p => "BroadcastHashJoin".r.findAllIn(p).size >= 2),
      "no cartesian across expansion" -> (p => !p.contains("CartesianProduct")))
    audit("b2_hybrid_rrf")(
      "fusion stays hash-aggregated, never a cross of the rank lists" ->
        (p => !p.contains("CartesianProduct")),
      "partial heap on the fused scores" ->
        (p => p.contains("partial_topk_by_dist")))
    audit("a10_knn_join")(
      "self-product is the guarded broadcast form (exact path)" ->
        (p => p.contains("BroadcastNestedLoopJoin")),
      "partial heap per row" -> (p => p.contains("partial_topk_by_dist")))
    audit("a11_knn_classify")(
      "vote aggregate is hash-based over the hits, no corpus window" ->
        (p => p.contains("HashAggregate")))
    audit("p17_domain_rank")(
      "rank iteration joins stay hash-based (no cartesian across rounds)" ->
        (p => !p.contains("CartesianProduct")))
    audit("p19_trust_rank")(
      "trust iteration joins stay hash-based (no cartesian across rounds)" ->
        (p => !p.contains("CartesianProduct")))
    audit("p18_host_hits")(
      "hub/auth join of the checkpointed results stays hash-based" ->
        (p => !p.contains("CartesianProduct")))
    audit("a12_hnsw_topk")(
      "per-shard candidates merge through the partial heap, no cartesian" ->
        (p => p.contains("partial_topk_by_dist") && !p.contains("CartesianProduct")),
      "shard build + candidate dedup-fold + k-heap: exactly 3 exchanges, all candidate-sized past the first" ->
        (p => p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3))
    audit("a13_hnsw_at_rest")(
      "probe reads adjacency from the segment store (parquet scan present)" ->
        (p => p.contains("Scan parquet") || p.contains("FileScan parquet")),
      "per-shard candidates merge through the partial heap, no cartesian" ->
        (p => p.contains("partial_topk_by_dist") && !p.contains("CartesianProduct")))
    audit("b7_phrase_match")(
      "anchor prune is a broadcast membership join over scan-stage tokens" ->
        (p => (p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
          && !p.contains("CartesianProduct")),
      "no corpus-sized exchange (df comes from the filtered scan)" ->
        (p => !p.contains("Exchange hashpartitioning(doc_id")))
    audit("b6_hybrid_at_rest")(
      "postings scan statically pruned to the query terms' buckets" ->
        (p => p.linesIterator.exists(l =>
          l.contains("PartitionFilters:") && l.contains("bucket#"))),
      "fusion stays hash-aggregated over candidate-sized rank lists" ->
        (p => !p.contains("CartesianProduct")),
      "per-query top-k is a partial heap aggregate" ->
        (p => p.contains("partial_topk_by_dist")))
    audit("a9b_sq8_at_rest")(
      // the at-rest premise: the probe's ADC stage scans the persisted
      // codes — no bounds re-fit, no re-projection of the corpus (those
      // would surface as min/max aggregates and the encode's
      // least/greatest clamp chain over the embedding column)
      "ADC stage reads persisted codes, never re-encodes the corpus" ->
        (p => p.contains("codes#") && !p.contains("least(greatest(")),
      "no bounds aggregate anywhere in the probe plan" ->
        (p => !p.contains("min(element_at(embedding")),
      "ADC is flat codegen algebra, no interpreted HOF fold" ->
        (p => !p.contains("lambdafunction")),
      "shortlist + re-rank finish in partial heap aggregates" ->
        (p => p.contains("partial_topk_by_dist")))
    audit("a7b_pq_at_rest")(
      // (the per-query ADC-table UDF remains — query-batch-sized by
      // construction; what must NOT appear is a corpus-sized encode,
      // which would surface as a UDF project over the embeddings scan
      // feeding the code column instead of a parquet codes scan)
      "probe scores the persisted code table off parquet" ->
        (p => p.contains("codes#") &&
          (p.contains("Scan parquet") || p.contains("FileScan parquet"))),
      "ADC is flat codegen algebra, no interpreted HOF fold" ->
        (p => !p.contains("lambdafunction")),
      "bounded-heap finish, no cartesian" ->
        (p => p.contains("topk_by_dist") && !p.contains("CartesianProduct")))
    audit("b9_rerank_overlap")(
      "rerank pair joins are broadcast (candidates are query-batch-sized)" ->
        (p => p.contains("BroadcastHashJoin")),
      "no cartesian anywhere in the rerank composition" ->
        (p => !p.contains("CartesianProduct")))
    audit("b8_bm25_delete")(
      // mark-delete must exclude dead docs AT SCAN STAGE: the small
      // tombstone set becomes a NOT IN predicate pushed into the
      // postings parquet scan, not a post-join filter
      "tombstone exclusion pushed to the postings scan" ->
        (p => p.contains("Not(In(doc_id")),
      "probe still bucket-joined, partial-heap finished" ->
        (p => p.contains("partial_topk_by_dist") && !p.contains("CartesianProduct")))
    audit("a8b_ivfpq_at_rest")(
      "coarse membership is an equi-join on centroid_id over persisted lists" ->
        (p => p.contains("centroid_id") &&
          (p.contains("Scan parquet") || p.contains("FileScan parquet"))),
      "no shuffled cartesian in the composed at-rest path" ->
        (p => !p.contains("CartesianProduct")),
      "ADC is flat codegen algebra, no interpreted HOF fold" ->
        (p => !p.contains("lambdafunction")))
    audit("a14_hnsw_routed")(
      "segment scan statically pruned to the routed shards" ->
        (p => p.linesIterator.exists(l =>
          l.contains("PartitionFilters") && l.contains("shard"))),
      "per-shard candidates merge through the partial heap, no cartesian" ->
        (p => p.contains("partial_topk_by_dist") && !p.contains("CartesianProduct")))
    audit("s6_xlsx_flatten")(
      "pack+extract run inside the scan-stage project (single pipeline)" ->
        (p => p.contains("xlsx_extract(xlsx_pack(")),
      "only the final order-by exchanges (extraction never shuffles)" ->
        (p => p.linesIterator.count(_.contains("Exchange")) == 1))
    audit("t8_index_mor")(
      "tombstone resolution is one doc-keyed join (broadcast at this size)" ->
        (p => p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")))
    audit("x25_score_calibration")(
      "one exchange for the per-source window, nothing else" ->
        (p => p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1))

    // PageRank iteration shape: the cached edge table (pre-partitioned by
    // src) must NOT re-exchange inside an iteration — the only shuffles
    // are rank-table-sized. Audited on one iterationStep with broadcast
    // joins and AQE off, so the plan is the scale (sort-merge) shape and a
    // plain (non-adaptive) tree we can walk: any ShuffleExchange with the
    // edge cache (the plan's only InMemoryTableScan) below it means the
    // full edge set moves every round.
    {
      import org.apache.spark.sql.functions.{col, count, lit}
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val edges = graft.ops.HostGraph.prepEdges(
          docs.selectExpr("doc_id % 37 AS src", "(doc_id * 7 + 3) % 37 AS dst"),
          "src", "dst")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        edges.count()
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node")))
          .distinct().localCheckpoint(true)
        val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          .localCheckpoint(true)
        val n = nodes.count()
        val ranks0 = nodes.withColumn("rank_scaled", lit(1000000000000L / n))
          .localCheckpoint(true)
        val bases0 = nodes.withColumn("base", lit(1L)).localCheckpoint(true)
        val step = graft.ops.HostGraph.iterationStep(
          edges, bases0, outdeg, ranks0, dampingPct = 85)
        val plan = step.queryExecution.executedPlan
        val edgeReshuffles = plan.collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if narrowPathToCache(s.child) => s
        }
        if (edgeReshuffles.nonEmpty) {
          failed += 1
          println("FAIL p17_iteration_shape: cached edges re-exchange per iteration")
          println(plan.toString.linesIterator.take(60).mkString("\n"))
        } else println(
          "PASS p17_iteration_shape: edge cache feeds the join without re-exchange")

        // HITS auth-step shape: the src-partitioned edge cache must feed
        // the hub join without re-exchange (the dst-partitioned twin
        // covers the hub step symmetrically — same persisted-layout law).
        val hubs0 = nodes.withColumn("hub_scaled", lit(1000000L))
          .localCheckpoint(true)
        val authStep = edges
          .join(hubs0.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(org.apache.spark.sql.functions.sum(col("hub_scaled")).as("raw"))
        val authReshuffles = authStep.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if narrowPathToCache(s.child) => s
        }
        if (authReshuffles.nonEmpty) {
          failed += 1
          println("FAIL p18_iteration_shape: cached edges re-exchange in the auth step")
          println(authStep.queryExecution.executedPlan.toString
            .linesIterator.take(60).mkString("\n"))
        } else println(
          "PASS p18_iteration_shape: edge cache feeds the auth join without re-exchange")
        edges.unpersist()
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }

    // Section-partitioned index: a filtered search must prune partitions
    // at the scan, not read-then-filter.
    {
      val tmp = java.nio.file.Files.createTempDirectory("graft_idx").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .limit(200)
        .selectExpr("doc_id",
          "CASE WHEN doc_id % 10 = 0 THEN text " +
            "ELSE 'SECTION ' || upper(lang) || chr(10) || chr(10) || text END AS text")
      graft.index.VectorIndex.write(graft.index.VectorIndex.build(docs), tmp)
      val loaded = graft.index.VectorIndex.load(spark, tmp)
        .where(org.apache.spark.sql.functions.col("section") === "SECTION EN")
      val plan = loaded.queryExecution.executedPlan.toString
      val ok = plan.contains("PartitionFilters: [isnotnull(section") ||
        plan.contains("PartitionFilters: [section")
      if (!ok) {
        failed += 1
        println("FAIL index_partition_pruning: section filter not pruning partitions")
        println(plan.linesIterator.take(30).mkString("\n"))
      } else println("PASS index_partition_pruning: section filter prunes at scan")
    }

    // ep8's pre-sectionize stretch: .warc.gz file → records → decoded
    // text → stripped doc rows must be ONE narrow stage — a task per
    // archive file, zero Exchange (the sectionizer's per-doc window is
    // the composition's FIRST shuffle, by design).
    {
      import org.apache.spark.sql.functions.{col, split, element_at}
      val d = java.nio.file.Files.createTempDirectory("graft_audit_ep8")
      val blob = graft.ingest.Warc.writeRecords(Iterator(
        graft.ingest.Warc.WarcRecord("response", "urn:a:1",
          "http://x.local/doc/0001", "text/html",
          "<html><body><pre>hello audit</pre></body></html>"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))),
        gzipPerRecord = true)
      java.nio.file.Files.write(d.resolve("a.warc.gz"), blob)
      val corpus = graft.ingest.Warc.responseText(
        graft.ingest.Warc.readWarc(spark, d.toString))
        .select(
          element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
          graft.ingest.TextSources.stripMarkup(col("text")).as("text"))
      val plan = corpus.queryExecution.executedPlan.toString
      val ok = !plan.contains("Exchange")
      if (!ok) {
        failed += 1
        println("FAIL ep8_warc_rag: pre-sectionize stretch shuffles")
        println(plan.linesIterator.take(40).mkString("\n"))
      } else println(
        "PASS ep8_warc_rag: pre-sectionize stretch is shuffle-free (one task per archive)")
    }

    // Round-15 day-partitioned chat log: beyond the maintenance wins
    // (prune = partition drop), the layout must also pay off at READ time
    // — a horizon-scoped audit query (`day >= N`) must prune partitions
    // at the scan, never read-then-filter.
    {
      import org.apache.spark.sql.functions.col
      val d = java.nio.file.Files.createTempDirectory("graft_audit_daylog")
      val log = s"$d/log"
      import spark.implicits._
      graft.serve.ChatLog.append(
        Seq(("u1", "m0", "r", 10L), ("u2", "m1", "r", 150L),
          ("u1", "m2", "r", 250L))
          .toDF("user", "message", "response", "ts"),
        log, dayWidth = 100L)
      val scoped = spark.read.parquet(log).where(col("day") >= 2)
      val plan = scoped.queryExecution.executedPlan.toString
      val ok = plan.contains("PartitionFilters: [") && (
        plan.contains("PartitionFilters: [isnotnull(day") ||
          plan.contains("PartitionFilters: [(day"))
      if (!ok) {
        failed += 1
        println("FAIL chatlog_day_pruning: day filter not pruning partitions")
        println(plan.linesIterator.take(30).mkString("\n"))
      } else println(
        "PASS chatlog_day_pruning: horizon-scoped log reads prune day= partitions at scan")
    }

    println(if (failed == 0) "ALL PLAN AUDITS PASS" else s"$failed AUDIT(S) FAILED")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
