package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for LLM training-data pipelines: the steps
  * that come AFTER curation (quality gates + dedup, `CorpusPipeline`) and
  * BEFORE the trainer reads shards — deterministic sampling, source
  * mixing, train/val splitting, shard assignment, context-window packing,
  * and corpus-level n-gram duplication / benchmark decontamination.
  *
  * Reference scope note: the reference app (app.py) stops at index build;
  * these operators are the north-star extension surface (BASELINE.json)
  * that makes the engine a usable 100 TB pre-training pipeline.
  *
  * Design rules shared by every operator here:
  *  - **Deterministic, no `rand()`.** Sampling/splitting/sharding key off
  *    `md5(id)` so reruns, retries, and speculative tasks agree row-for-row
  *    (a `rand()`-based sample is not reproducible across retries — a real
  *    failure mode for 100 TB jobs where stage retries are routine). md5 is
  *    also portable: DuckDB computes the identical hex, so every operator
  *    is oracle-checkable.
  *  - **One declarative plan per operator.** No driver-side loops, no
  *    collect; Catalyst sees the whole computation.
  *  - **Partition-local where possible.** Hash split and shard assignment
  *    are pure per-row column algebra (zero shuffle); sampling shuffles
  *    once on the stratum key; packing windows inside an explicit group
  *    (never a global sort).
  */
object TrainingData {

  /** Uniform deterministic per-row order/placement key: md5 over the id
    * rendered as decimal text. Identical in DuckDB (`md5(CAST(id AS
    * VARCHAR))`), uniform in its leading hex digits, and independent of
    * row content so re-chunked/re-encoded corpora keep their sample.
    */
  def orderKey(id: Column): Column = md5(id.cast("string"))

  // ------------------------------------------------------------- sampling

  /** Deterministic stratified sample: the `perStratum` rows of each
    * stratum that sort first by `orderKey(id)` — i.e. an md5-keyed uniform
    * sample with an exact per-stratum quota (strata smaller than the quota
    * are kept whole).
    *
    * Scale: one shuffle keyed on the stratum column, then a per-stratum
    * sort inside the window. Fine while strata fit a task's sort budget;
    * for strata of billions of rows use [[stratifiedSampleLarge]], which
    * pre-filters on the uniform md5 key so the sort only ever sees
    * ~margin×quota rows per stratum and returns the identical sample.
    */
  def stratifiedSample(
      docs: DataFrame,
      stratumCol: String,
      perStratum: Int,
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(orderKey(col(idCol)), col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Cluster-balanced (diversity) sampling: k embedding clusters from the
    * bounded seeded fit ([[Ann.buildIvfSampled]]'s coarse quantizer —
    * hash-chosen sample, RNG-free restarted Lloyd's), then the
    * md5-deterministic per-stratum quota over the CLUSTER id
    * ([[stratifiedSample]]'s exact law). The diversity-sampling shape
    * SemDeDup/DataComp-era pipelines put between dedup and mixing:
    * uniform sampling over-represents dense regions of embedding space;
    * per-cluster quotas keep the tails (rare languages, rare formats,
    * rare topics) in the training mix. Returns the selected rows with
    * their `centroid_id`.
    *
    * Scale: the fit is driver-bounded (`sampleCap` vectors, KB of
    * parameters), assignment is one scan-stage pass, and the quota is
    * the per-stratum rank — no corpus-sized collect anywhere.
    * Deterministic end to end, so `p21` golden-pins it (seeded KMeans is
    * not SQL-expressible; the quota law is re-proven in
    * TrainingDataSpec against an independent MessageDigest md5).
    */
  def clusterBalancedSample(
      emb: DataFrame,
      k: Int,
      perCluster: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxIter: Int = 20,
      sampleCap: Int = 65536,
      seed: Long = 42L): DataFrame = {
    val (assigned, _) =
      Ann.buildIvfSampled(emb, idCol, vecCol, k, maxIter, sampleCap, seed)
    stratifiedSample(assigned, "centroid_id", perCluster, idCol)
  }

  /** [[stratifiedSample]] for strata too large to sort: same md5-keyed
    * sample, computed without ever ranking a full stratum.
    *
    * Two-pass plan:
    *  1. per-stratum row counts (a column-pruned count aggregate — the
    *     cheap pass);
    *  2. keep only rows whose 32-bit md5 prefix falls below
    *     `margin × perStratum / stratumSize` of the key space (a pure
    *     per-row filter — no shuffle, prunes ~everything for huge
    *     strata), then rank the ~margin×quota survivors per stratum
    *     exactly as [[stratifiedSample]] does.
    *
    * Because the md5 prefix is uniform, the pre-filter keeps every row
    * the full rank would have kept as long as at least
    * `min(perStratum, stratumSize)` rows survive — the survivor count is
    * Binomial(size, margin·quota/size) with mean margin·quota, so at the
    * default margin 4 a shortfall is a < exp(-quota) tail event. The
    * `strict` check (default on) verifies the guarantee per stratum and
    * throws rather than return a silently different sample — rerun with
    * a larger margin if it ever fires (it is a one-extra-aggregate
    * action on the already-tiny filtered side).
    */
  def stratifiedSampleLarge(
      docs: DataFrame,
      stratumCol: String,
      perStratum: Int,
      idCol: String = "doc_id",
      margin: Double = 4.0,
      strict: Boolean = true): DataFrame = {
    require(margin > 1.0, s"stratifiedSampleLarge: margin $margin must exceed 1")
    val sizes = docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__size"))
      .withColumn("__frac",
        least(lit(1.0), lit(margin * perStratum) / col("__size")))
      .withColumn("__th",
        lpad(lower(hex((col("__frac") * 4294967296.0).cast("long"))), 8, "0"))
    val filtered = docs.join(broadcast(sizes), stratumCol)
      .where(col("__frac") >= 1.0 ||
        substring(orderKey(col(idCol)), 1, 8) < col("__th"))
    if (strict) {
      val short = filtered.groupBy(col(stratumCol), col("__size"))
        .agg(count(lit(1)).as("__kept"))
        .where(col("__kept") < least(lit(perStratum.toLong), col("__size")))
        .limit(1).collect()
      require(short.isEmpty,
        s"stratifiedSampleLarge: pre-filter shortfall in stratum " +
          s"'${short.headOption.map(_.get(0)).orNull}' — rerun with margin > $margin")
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(orderKey(col(idCol)), col(idCol))
    filtered.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= perStratum)
      .drop("__rn", "__size", "__frac", "__th")
  }

  /** Deterministic source-mixture downsampling: per-stratum quotas derived
    * from target mixture `weights` over a `total` row budget
    * (`quota = floor(weight * total)`), taken with the same md5-keyed
    * uniform rule as [[stratifiedSample]]. Strata absent from `weights`
    * are dropped; strata smaller than their quota are kept whole (this
    * operator never replicates rows — upweighting a small source is the
    * trainer's epoch-weighting job, not the corpus assembler's).
    *
    * Scale: the quota table is a literal (broadcast side); the corpus side
    * shuffles once on the stratum key.
    */
  def sourceMixture(
      docs: DataFrame,
      stratumCol: String,
      weights: Map[String, Double],
      total: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty, "sourceMixture: empty weight map")
    require(weights.values.forall(_ >= 0), "sourceMixture: negative weight")
    val spark = docs.sparkSession
    import spark.implicits._
    val quotas = weights.toSeq
      .map { case (k, wgt) => (k, math.floor(wgt * total).toLong) }
      .toDF(stratumCol, "__quota")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(orderKey(col(idCol)), col(idCol))
    docs.join(broadcast(quotas), stratumCol)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Temperature-scaled source mixture (the mT5 / XLM-R α-sampling
    * recipe, Xue et al. 2021 §3.1): sampling mass per source ∝ p_i^α
    * where p_i is the source's share of the corpus and α ∈ (0, 1]
    * flattens the distribution — α = 1 is proportional, α → 0 uniform;
    * 0.3 is the mT5 setting. Unlike [[sourceMixture]] the weights are
    * DERIVED from the observed per-source counts, so no weight map is
    * supplied — just α and the row budget.
    *
    * Determinism discipline (the x19 grid rule): the only floating-point
    * step, `count^α`, is quantized to the 1e-6 integer grid immediately
    * (`round(pow(n, α) · 1e6)` as a long); quotas are then EXACT integer
    * algebra — `quota_i = total · w6_i div Σ w6` — so an oracle
    * recomputes them bit-for-bit and partial-aggregation order cannot
    * leak in. Selection is the md5-keyed uniform rule shared with
    * [[stratifiedSample]]. Sources smaller than their quota are kept
    * whole (never replicated). Σ quota ≤ total by floor; the remainder
    * (< #sources rows) is deliberately NOT redistributed — a stable
    * under-fill beats an engine-dependent largest-remainder tiebreak.
    *
    * Scale: per-source counts are one map-combined aggregate over a
    * column; the quota table (#sources rows) broadcasts back; the corpus
    * pays the same single stratum-keyed shuffle as [[sourceMixture]].
    */
  def temperatureMixture(
      docs: DataFrame,
      stratumCol: String,
      alpha: Double,
      total: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperatureMixture: alpha $alpha outside (0, 1]")
    require(total > 0, "temperatureMixture: non-positive total")
    val w6 = round(pow(col("__n"), alpha) * 1e6).cast("long")
    val quotas = docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w6", w6)
      .withColumn("__tot6", sum(col("__w6")).over(Window.partitionBy()))
      .withColumn("__quota", expr(s"$total * __w6 div __tot6"))
      .select(col(stratumCol), col("__quota"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(orderKey(col(idCol)), col(idCol))
    docs.join(broadcast(quotas), stratumCol)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Token-budget source mixture: keep documents per stratum, in the
    * deterministic [[orderKey]] order, until the stratum's TOKEN budget is
    * exhausted — LM mixtures are specified in tokens, not documents (a
    * 100-token snippet and a 10k-token article are not interchangeable,
    * which is exactly what [[sourceMixture]]'s row quotas get wrong when
    * document length correlates with source).
    *
    * A document is kept iff the EXCLUSIVE prefix token sum of the docs
    * before it (md5 order) is still under the budget: each stratum
    * overshoots by at most one document and is never undershot while
    * docs remain. Strata absent from `budgets` are dropped; rows are
    * never replicated (epoch upweighting is [[epochMixture]]'s job).
    * Token counts are [[TextAnalytics.tokenCount]] (whitespace) so the
    * whole selection is exact integer arithmetic, oracle-checkable.
    *
    * Scale: one shuffle on the stratum key for the running sum; the
    * budget table is a literal broadcast. A prefix sum cannot truncate
    * map-side the way a rank can, so for strata far larger than their
    * budget compose with the [[stratifiedSampleLarge]] md5-prefix
    * pre-filter (bound the candidate set to ~margin × budget/avg_tokens
    * rows) before paying the sort.
    */
  def tokenMixture(
      docs: DataFrame,
      stratumCol: String,
      budgets: Map[String, Long],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgets.nonEmpty, "tokenMixture: empty budget map")
    require(budgets.values.forall(_ >= 0), "tokenMixture: negative budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val budgetDf = budgets.toSeq.toDF(stratumCol, "__budget")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(orderKey(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("n_tokens", TextAnalytics.tokenCount(col(textCol)))
      .join(broadcast(budgetDf), stratumCol)
      .withColumn("__before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .where(col("__before") < col("__budget"))
      .drop("__budget", "__before")
  }

  /** Deterministic train/validation split: a row lands in `val` iff the
    * first 8 hex digits of `md5(id)` fall below `valFrac` of the 32-bit
    * space (lexicographic compare — hex strings of equal length order
    * numerically). Pure per-row column algebra: zero shuffle, stable
    * under retries, and any doc keeps its split across corpus versions
    * as long as its id is stable.
    *
    * Granularity is 1/2^32 — exact enough that the realized fraction
    * converges to `valFrac` at corpus scale.
    */
  def hashSplit(
      docs: DataFrame,
      valFrac: Double,
      idCol: String = "doc_id",
      splitCol: String = "split"): DataFrame = {
    require(valFrac >= 0 && valFrac <= 1, s"hashSplit: valFrac $valFrac outside [0,1]")
    val threshold = f"${math.min((valFrac * 4294967296.0).toLong, 4294967295L)}%08x"
    val isVal =
      if (valFrac >= 1.0) lit(true)
      else substring(orderKey(col(idCol)), 1, 8) < lit(threshold)
    docs.withColumn(splitCol, when(isVal, "val").otherwise("train"))
  }

  /** Deterministic shard assignment: `shard = bucket256(md5(id)) % nShards`
    * where bucket256 is the first two hex digits. Pure per-row column
    * algebra — the assignment itself needs no shuffle; the subsequent
    * shard write is `df.repartition(nShards, col(shardCol)).write...`,
    * one shuffle keyed on the shard, each output file written by exactly
    * one task (no tiny-file explosion, no driver-side routing).
    *
    * `nShards` must divide 256 so every shard covers the same number of
    * hash buckets (exact uniformity of the bucket→shard map; realized row
    * counts are then hash-uniform). For finer fan-out compose with a
    * second-level key.
    */
  def shardAssign(
      docs: DataFrame,
      nShards: Int,
      idCol: String = "doc_id",
      shardCol: String = "shard"): DataFrame = {
    require(nShards > 0 && 256 % nShards == 0,
      s"shardAssign: nShards $nShards must divide 256")
    val bucket = conv(substring(orderKey(col(idCol)), 1, 2), 16, 10).cast("long")
    docs.withColumn(shardCol, (bucket % nShards).cast("int"))
  }

  // ------------------------------------------------------------- packing

  /** Concat-and-chunk context-window packing: within each group, documents
    * are laid end-to-end in `orderCol` order and the resulting token tape
    * is cut every `capacity` tokens — the standard pre-training packing
    * layout (every context window is full; documents may straddle window
    * boundaries). Emits per-document placement:
    *
    *  - `offset`        absolute token offset of the doc on its group's tape
    *  - `start_bin`     context window the doc starts in
    *  - `offset_in_bin` token offset inside that window
    *  - `n_bins`        number of windows the doc touches (≥ 1; a
    *                    zero-token doc counts as touching its start window)
    *
    * All integer math — exact, order-independent of physical row layout,
    * oracle-checkable.
    *
    * Scale: ONE window partitioned by `groupCols` (e.g. the shard from
    * [[shardAssign]]) — never a global sort. Each group's tape is
    * independent, so packing parallelizes across shards exactly like the
    * trainer reads them.
    */
  def concatPack(
      docs: DataFrame,
      capacity: Long,
      groupCols: Seq[String],
      orderCol: String = "doc_id",
      tokensCol: Column = null): DataFrame = {
    require(capacity > 0, "concatPack: capacity must be positive")
    require(groupCols.nonEmpty,
      "concatPack: empty groupCols would be a single global sort — shard first")
    val toks = Option(tokensCol).getOrElse(TextAnalytics.tokenCount(col("text")))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
    // integer `div`, not floor(double /): a group tape can exceed 2^53
    // tokens before a 100 TB corpus exceeds it in rows, and bin ids must
    // stay exact there
    docs.withColumn("__tokens", toks.cast("long"))
      .withColumn("__cum", sum(col("__tokens")).over(w))
      .withColumn("offset", col("__cum") - col("__tokens"))
      .withColumn("start_bin", expr(s"`offset` div ${capacity}L"))
      .withColumn("offset_in_bin", col("offset") - col("start_bin") * capacity)
      .withColumn("n_bins",
        (expr(s"greatest(__cum - 1, `offset`) div ${capacity}L")
          - col("start_bin") + 1).cast("long"))
      .withColumn("n_tokens", col("__tokens"))
      .drop("__tokens", "__cum")
  }

  /** Shard manifest: the per-shard summary a trainer's data loader reads
    * before touching any shard file — doc/token/byte totals and the
    * context-window count at `capacity` ([[concatPack]]'s tape cut). One
    * aggregate pass over (shard, tokens, bytes); integer-exact, so the
    * manifest doubles as a cross-run corpus checksum.
    */
  def shardManifest(
      sharded: DataFrame,
      capacity: Long,
      shardCol: String = "shard",
      textCol: String = "text"): DataFrame = {
    require(capacity > 0, "shardManifest: capacity must be positive")
    sharded
      .groupBy(col(shardCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalytics.tokenCount(col(textCol))).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"))
      .withColumn("n_windows",
        expr(s"(n_tokens + ${capacity - 1}L) div ${capacity}L"))
  }

  /** Epoch-aware mixture: replicate each source `epochs(source)` times —
    * the data-constrained regime where a high-value source is repeated for
    * several passes while the bulk gets one (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models": repeating up to ~4 epochs
    * is nearly as good as new data). Complements [[sourceMixture]], which
    * only ever downsamples.
    *
    * Each doc emits `floor(ep)` full copies plus one more with probability
    * `frac(ep)` — decided by an md5 coin keyed on `(id, copy)`, so the
    * fractional pass is a uniform subset, deterministic and retry-stable.
    * Output gains a `copy` column (0-based repetition index — feed it into
    * [[shardAssign]]'s id or the pack order so repeats spread across
    * shards). Strata absent from `epochs` are dropped.
    *
    * Scale: pure column algebra — a broadcast-literal quota join + a
    * per-row explode of at most `ceil(ep)` copies; no shuffle at all.
    */
  def epochMixture(
      docs: DataFrame,
      stratumCol: String,
      epochs: Map[String, Double],
      idCol: String = "doc_id",
      copyCol: String = "copy"): DataFrame = {
    require(epochs.nonEmpty, "epochMixture: empty epoch map")
    require(epochs.values.forall(e => e >= 0 && e <= 64),
      "epochMixture: epochs must be in [0, 64] — repeating a source more " +
        "than a few times buys nothing (Muennighoff et al. 2023, fig. 2)")
    val spark = docs.sparkSession
    import spark.implicits._
    val quotas = epochs.toSeq.toDF(stratumCol, "__ep")
    docs.join(broadcast(quotas), stratumCol)
      .withColumn(copyCol,
        explode(when(ceil(col("__ep")) >= 1,
          sequence(lit(0), ceil(col("__ep")).cast("int") - 1))
          .otherwise(array())))
      .withColumn("__frac", col("__ep") - floor(col("__ep")))
      .withColumn("__th",
        lpad(lower(hex((col("__frac") * 4294967296.0).cast("long"))), 8, "0"))
      .where(col(copyCol) < floor(col("__ep")).cast("int") ||
        substring(md5(concat(col(idCol).cast("string"), lit(":"),
          col(copyCol).cast("string"))), 1, 8) < col("__th"))
      .drop("__ep", "__frac", "__th")
  }

  /** Materialize a sharded corpus the way a trainer's loader reads it:
    * `shards/shard=N/` parquet directories (one shuffle keyed on the
    * shard column; each shard written by one task — no tiny-file
    * explosion) plus the [[shardManifest]] alongside, so the loader can
    * plan windows without opening a single shard file.
    */
  def writeShards(
      sharded: DataFrame,
      path: String,
      capacity: Long,
      nShards: Int,
      shardCol: String = "shard",
      textCol: String = "text"): Unit = {
    sharded
      .repartition(nShards, col(shardCol))
      .write.mode("overwrite").partitionBy(shardCol)
      .parquet(s"$path/shards")
    shardManifest(sharded, capacity, shardCol, textCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Load a [[writeShards]] layout: (sharded docs, manifest). Reading one
    * shard is partition pruning at the scan
    * (`.where(col("shard") === n)`), not a directory walk.
    */
  def loadShards(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/shards"), spark.read.parquet(s"$path/manifest"))

  // ------------------------------------- n-gram duplication / decontamination

  /** Distinct word n-grams per document: `(id, gram)` pairs, lowercased,
    * whitespace-tokenized (same tokenizer as `TextAnalytics.tokenCount`,
    * so "token" means the same thing across the engine). Documents shorter
    * than `n` tokens contribute nothing.
    */
  def ngramSets(
      docs: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n > 0, "ngramSets: n must be positive")
    val toks = when(length(trim(col(textCol))) === 0, array())
      .otherwise(split(lower(trim(col(textCol))), "\\s+"))
    docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        explode(when(size(col("__toks")) >= n,
          expr(s"transform(sequence(0, size(__toks) - $n), i -> " +
            s"array_join(slice(__toks, i + 1, $n), ' '))"))
          .otherwise(array())).as("gram"))
      .distinct()
  }

  /** Corpus-level repeated-passage detection (the signal behind
    * suffix-array training-data dedup, Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): word n-grams appearing
    * in at least `minDocs` distinct documents, with their document
    * frequency. The df-ranked output is the "memorization risk" report —
    * the passages a model would see many times per epoch.
    *
    * Scale: explicit two-stage plan — distinct `(doc, gram)` pairs (one
    * shuffle, map-side combine) then a count per gram (second shuffle on
    * the gram key, partial aggregation). The `minDocs` cutoff bounds the
    * output; the gram key space itself is bounded by corpus tokens, never
    * corpus² (no pairwise comparison anywhere).
    */
  def repeatedNgrams(
      docs: DataFrame,
      n: Int,
      minDocs: Long,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    ngramSets(docs, n, idCol, textCol)
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)

  /** Benchmark decontamination check: for each eval document, how many of
    * its distinct word n-grams also occur anywhere in the training corpus
    * (n-gram–overlap contamination in the GPT-3 / PaLM style). Returns
    * `(eval id, n_shared, n_grams, share)` for contaminated docs only —
    * the removal list is `share >= threshold` on the caller's side.
    *
    * Scale: the eval/benchmark side is small by nature — its distinct
    * grams are the broadcast build side, the 100 TB training side streams
    * through one hash-join + partial count without ever being collected
    * or re-shuffled. Train-side grams are deduped per doc first so a
    * passage repeated inside one train doc doesn't inflate the count.
    * The broadcast is guarded (same discipline as the ANN candidate
    * joins): an eval side whose gram set exceeds `maxBroadcastGrams`
    * falls back to a shuffle join — slower, never a driver OOM. The
    * probe scans at most cap+1 rows (limit pushes down).
    */
  def contamination(
      train: DataFrame,
      eval: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBroadcastGrams: Int = 4000000): DataFrame = {
    // materialized once: consumed by the size probe (an action), the
    // gram join, and the per-doc totals — three executions otherwise
    val evalGrams = ngramSets(eval, n, idCol, textCol)
      .withColumnRenamed(idCol, "eval_id")
      .localCheckpoint(true)
    def guarded(df: DataFrame): DataFrame =
      if (df.limit(maxBroadcastGrams + 1).count() <= maxBroadcastGrams)
        broadcast(df)
      else df
    val evalSide = guarded(evalGrams)
    val trainGrams = ngramSets(train, n, idCol, textCol).select("gram").distinct()
    val totals = evalGrams.groupBy("eval_id").agg(count(lit(1)).as("n_grams"))
    trainGrams.join(evalSide, "gram")
      .groupBy("eval_id").agg(count(lit(1)).as("n_shared"))
      .join(guarded(totals), "eval_id")
      .withColumn("share",
        round(col("n_shared").cast("double") / col("n_grams"), 6))
  }

  // --------------------------------------- importance resampling (DSIR)

  /** Hashed n-gram feature counts per document — the DSIR feature space
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling", arXiv:2302.03169 §3: unigrams + bigrams hashed into
    * `nBuckets`). Returns `(id, bucket, cnt)` — a COUNT multiset, unlike
    * [[ngramSets]]'s distinct sets, because importance weights are products
    * over feature occurrences.
    *
    * The bucket hash is the md5-prefix integer ([[orderKey]] discipline):
    * deterministic, retry-stable, and portable — DuckDB computes the
    * identical bucket, so the whole DSIR pipeline stays oracle-checkable.
    */
  def hashedGramBuckets(
      docs: DataFrame,
      nBuckets: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nBuckets > 0, "hashedGramBuckets: nBuckets must be positive")
    val toks = when(length(trim(col(textCol))) === 0, array())
      .otherwise(split(lower(trim(col(textCol))), "\\s+"))
    val bucket = pmod(
      conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long"),
      lit(nBuckets.toLong))
    docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), explode(concat(
        col("__toks"),
        when(size(col("__toks")) >= 2,
          expr("transform(sequence(0, size(__toks) - 2), i -> " +
            "concat(element_at(__toks, i + 1), ' ', element_at(__toks, i + 2)))"))
          .otherwise(array()))).as("gram"))
      .select(col(idCol), bucket.as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** DSIR importance weights: for each raw-corpus doc, the log-likelihood
    * ratio of its hashed-n-gram features under the TARGET distribution vs
    * the RAW distribution — `log ŵ(x) = Σ_features log p_target/p_raw` with
    * Laplace-smoothed bucket unigram models (α = 1). High weight = "looks
    * like the target domain".
    *
    * Returns `(id, n_feats, logw_q)` where `logw_q = round(log ŵ × 10⁶)` —
    * the log-weight on a fixed 10⁻⁶ grid. Quantizing per BUCKET makes the
    * per-doc sum exact integer arithmetic: associative, partial-aggregation-
    * order-independent, identical in any engine — the weights are
    * hash-stable facts, not float accidents. Docs with no features (empty
    * text) emit no row.
    *
    * Scale: the bucket model tables are ≤ `nBuckets` rows (broadcast); the
    * raw corpus streams through one explode + one broadcast join + one
    * keyed aggregate — linear, two shuffles (feature count, per-doc sum),
    * nothing corpus-sized ever sits on the driver.
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      nBuckets: Int = 8192,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rawFeats = hashedGramBuckets(raw, nBuckets, idCol, textCol)
    val targetFeats = hashedGramBuckets(target, nBuckets, idCol, textCol)
    val rawCounts = rawFeats.groupBy("bucket").agg(sum(col("cnt")).as("cnt_r"))
    val targetCounts = targetFeats.groupBy("bucket").agg(sum(col("cnt")).as("cnt_t"))
    val totals = rawCounts.agg(sum(col("cnt_r")).as("tot_r"))
      .crossJoin(targetCounts.agg(sum(col("cnt_t")).as("tot_t")))
    // log p_t/p_r per bucket with α=1 smoothing, quantized to the 1e-6
    // grid: round((ln(c_t+1) − ln(T+B) − ln(c_r+1) + ln(R+B)) · 1e6).
    // Every input is an exact integer, so both engines round the same
    // doubles (a flip needs the true value within ~ulp of a .5 boundary)
    val b = lit(nBuckets.toLong)
    val ratio = rawCounts
      .join(targetCounts, Seq("bucket"), "left")
      .na.fill(0L, Seq("cnt_t"))
      .crossJoin(totals)
      .select(col("bucket"),
        round((log(col("cnt_t") + 1) - log(col("tot_t") + b)
          - log(col("cnt_r") + 1) + log(col("tot_r") + b)) * 1e6, 0)
          .cast("long").as("ratio_q"))
    rawFeats.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("ratio_q")).as("logw_q"))
  }

  /** DSIR selection: sample `k` raw docs without replacement with
    * probability ∝ ŵ(x) via the Gumbel top-k trick (the DSIR paper's §3
    * sampling step): score = log ŵ + Gumbel noise, take the k largest.
    * The "noise" is deterministic — Gumbel-inverse-CDF of an md5-derived
    * uniform keyed on the doc id — so selection is reproducible,
    * retry-stable, and oracle-checkable end to end. Scores share
    * `logw_q`'s 10⁻⁶ integer grid (ties broken by id).
    *
    * Scale: weights as [[importanceWeights]]; selection is a global top-k
    * (`TakeOrdered` — map-side k-heaps, never a full sort).
    */
  def importanceResample(
      raw: DataFrame,
      target: DataFrame,
      k: Int,
      nBuckets: Int = 8192,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, "importanceResample: k must be positive")
    // u ∈ (0,1): (md5-prefix 60-bit integer + 0.5) / 2^60 — never exactly
    // 0 or 1, so the double Gumbel log is always finite
    val u = (conv(substring(md5(concat(col(idCol).cast("string"), lit(":gumbel"))),
      1, 15), 16, 10).cast("long") + lit(0.5)) / lit(1.152921504606846976e18)
    importanceWeights(raw, target, nBuckets, idCol, textCol)
      .withColumn("gumbel_q",
        round(-log(-log(u)) * 1e6, 0).cast("long"))
      .withColumn("score_q", col("logw_q") + col("gumbel_q"))
      .drop("gumbel_q")
      .orderBy(col("score_q").desc, col(idCol))
      .limit(k)
  }

  /** DPR-style hard-negative mining (Karpukhin et al. 2020 §5.2): for
    * each training query, the k nearest corpus items EXCLUDING its own
    * positives — the near-boundary negatives that actually train a
    * retriever (random negatives are trivially separable and teach
    * little). Candidates fetch at depth k + the max positives any query
    * carries (one driver-sized aggregate — training pairs are bounded
    * per query by construction, and the bound is required loudly),
    * positives drop by anti-join, and the dense re-rank cut at k is
    * EXACT: no query can lose more than its own positive count from the
    * fetched prefix. Ties break (dist asc, id asc) — the house kNN law.
    *
    * Scale: the fetch IS the batch-kNN heap ([[graft.search.Knn
    * .topKBatch]] — broadcast queries, map-side partial top-k, the
    * corpus never shuffles); the re-rank window sees only k + maxPos
    * rows per query (WindowGroupLimit, no full sort). At corpus scales
    * where exact scoring is off the table, `approx = true` routes the
    * fetch through [[graft.ops.Ann.rpTopKBatch]] at the same depth
    * (band-bucketed candidates, exact distances on the shortlist, same
    * (dist, id) tie law) — hard negatives tolerate approximate recall
    * by definition (a missed near neighbor just yields the
    * next-nearest negative; exclusion of positives stays EXACT either
    * way, so an approximate fetch can never leak a positive in).
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      positives: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      idCol: String = "doc_id",
      embCol: String = "embedding",
      approx: Boolean = false,
      nTables: Int = 12,
      nProjs: Int = 3,
      width: Double = 0.5): DataFrame = {
    require(k > 0, "hardNegatives: k must be positive")
    val maxPos = positives.groupBy(col(queryIdCol))
      .count().agg(max(col("count"))).head match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(maxPos <= 10000,
      s"hardNegatives: $maxPos positives on one query — the fetch depth " +
        "k + maxPos assumes bounded per-query positives")
    val fetched =
      if (approx)
        graft.ops.Ann.rpTopKBatch(queries, corpus, k + maxPos.toInt,
          nTables, nProjs, width,
          queryIdCol = queryIdCol, queryVecCol = queryVecCol,
          idCol = idCol, vecCol = embCol)
      else graft.search.Knn.topKBatch(
        queries, corpus, k + maxPos.toInt, queryIdCol, queryVecCol, idCol, embCol)
    val negs = fetched.join(
      positives.select(col(queryIdCol),
        col(idCol).cast("long").as(idCol)),
      Seq(queryIdCol, idCol), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col("rank"))
    negs.withColumn("neg_rank", row_number().over(w))
      .where(col("neg_rank") <= k)
      .select(col(queryIdCol), col("neg_rank").cast("long").as("rank"),
        col(idCol), col("dist"))
  }
}
