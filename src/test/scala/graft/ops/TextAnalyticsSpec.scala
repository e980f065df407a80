package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-level semantics of the analytics operators that no DuckDB
  * oracle can recompute (deflate); the SQL-expressible ones are oracled
  * via the x* queries instead.
  */
class TextAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherRules: each rule trips on its crafted violator, prose passes") {
    val prose = ("The report shows that revenue and costs have moved " +
      "together, with analysts expecting the trend to be stable. ") * 3
    val docs = Seq(
      (1L, prose),                                  // passes everything
      (2L, "too few words to be kept here"),        // fails word count
      (3L, ("a b c d " * 20) + "the and that with have"), // mean len < 3
      (4L, prose + (" ### ## # " * 20)),            // symbol ratio
      (5L, (1 to 20).map(i => s"- bullet item $i with the and that")
        .mkString("\n")),                           // 100% bullet lines
      (6L, (1 to 20).map(i => s"the and that with line $i trails off...")
        .mkString("\n")),                           // 100% ellipsis lines
      (7L, prose + (" 12345 67890 11111 22222 33333 " * 12)), // alpha frac
      (8L, "lorem ipsum dolor sit amet " * 10),     // no stopwords
      (9L, ""),
      (10L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = TextAnalytics.gopherRules(docs, minWords = 20).collect()
      .map(x => x.getLong(0) -> x).toMap
    def flag(id: Long, name: String): Boolean =
      r(id).getBoolean(r(id).fieldIndex(name))
    assert(flag(1L, "pass_gopher"), s"prose must pass: ${r(1L)}")
    assert(!flag(2L, "pass_words") && !flag(2L, "pass_gopher"))
    assert(!flag(3L, "pass_mean_len"), s"short words: ${r(3L)}")
    assert(!flag(4L, "pass_symbols"), s"hash spam: ${r(4L)}")
    assert(!flag(5L, "pass_bullets"), s"all bullets: ${r(5L)}")
    assert(!flag(6L, "pass_ellipsis"), s"all ellipses: ${r(6L)}")
    assert(!flag(7L, "pass_alpha"), s"digit flood: ${r(7L)}")
    assert(!flag(8L, "pass_stop"), s"no stopwords: ${r(8L)}")
    // empty/null: zero words fails word count, never throws/divides by 0
    Seq(9L, 10L).foreach { id =>
      assert(r(id).getLong(r(id).fieldIndex("n_words")) == 0L)
      assert(!flag(id, "pass_gopher"))
    }
    // scan-stage contract: no exchange anywhere in the plan
    val plan = TextAnalytics.gopherRules(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherRules must not shuffle:\n$plan")
  }

  test("gopherRepetition: dup lines and repeated n-grams trip their gates") {
    // all-distinct words arranged 10 per line: no repeated n-gram of any
    // order, no repeated line (a templated sentence per line would NOT be
    // clean — 5-grams from the shared template dominate the gram mass)
    val clean = (0 until 120).map(i => s"word${i}x").grouped(10)
      .map(_.mkString(" ")).mkString("\n")
    val dupLines = (Seq.fill(6)("The same boilerplate line repeats here.") ++
      Seq("One unique closing line appears once.")).mkString("\n")
    val loop = ("the quick brown fox jumps over the lazy dog again and " * 8).trim
    val docs = Seq(
      (1L, clean), (2L, dupLines), (3L, loop), (4L, ""), (5L, "tiny doc"))
      .toDF("doc_id", "text")
    val r = TextAnalytics.gopherRepetition(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    def d(id: Long, name: String): Double =
      r(id).getDouble(r(id).fieldIndex(name))
    def pass(id: Long): Boolean =
      r(id).getBoolean(r(id).fieldIndex("pass_repetition"))
    assert(pass(1L), s"clean prose must pass: ${r(1L)}")
    assert(d(2L, "dup_line_frac") > 0.7 && d(2L, "dup_line_char_frac") > 0.5
      && !pass(2L), s"dup lines: ${r(2L)}")
    assert(d(3L, "dup_5gram_frac") > 0.9 && !pass(3L),
      s"looped 10-gram text must saturate dup gram mass: ${r(3L)}")
    // empty docs: zero fractions, trivially passing, never a crash
    assert(d(4L, "dup_line_frac") == 0.0 && pass(4L))
    // a 2-word doc's only 2-gram IS the top 2-gram (full mass) — short
    // docs trip the top-gram gates by construction, exactly as in the
    // paper, where the word-count gate (gopherRules) owns them
    assert(d(5L, "top_2gram_frac") == 1.0 && !pass(5L))
    // determinism across runs (agg order must not leak into the fractions)
    val again = TextAnalytics.gopherRepetition(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keys.forall(k => r(k).toSeq == again(k).toSeq))
  }

  test("compressionRatio separates boilerplate from prose from noise") {
    val docs = Seq(
      (1L, "spam spam spam spam " * 50),                       // repetitive
      (2L, "The quarterly report outlines revenue growth across " +
        "three regions, with supply-chain costs partially offsetting " +
        "gains in the enterprise segment during the second half."),
      (3L, new scala.util.Random(7).alphanumeric.take(400).mkString), // noise
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = docs.select($"doc_id", TextAnalytics.compressionRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) < 0.1, s"mass repetition must compress hard, got ${r(1L)}")
    assert(r(2L) > r(1L) * 3, s"prose ${r(2L)} must sit well above boilerplate ${r(1L)}")
    assert(r(3L) > r(2L), s"alnum noise ${r(3L)} must exceed prose ${r(2L)}")
    assert(r(4L) == 1.0 && r(5L) == 1.0, "empty/null are neutral, not droppable")
    // deterministic across evaluations (fixed level/strategy)
    val again = docs.select($"doc_id", TextAnalytics.compressionRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(again == r)
  }

  test("curate's compression gate drops boilerplate, keeps prose, default is off") {
    val prose = "The quarterly report outlines revenue growth across " +
      "three regions with costs partially offsetting enterprise gains. " * 6
    val docs = Seq(
      (1L, "spam spam spam spam " * 60),  // repetitive boilerplate
      (2L, prose),
      (3L, prose + " second variant closes differently."))
      .toDF("doc_id", "text")
    val gated = CorpusPipeline.curate(docs, minQuality = 0.1, nearDupMinSim = 0.99,
      maxDocFreq = 1000L, minCompressionRatio = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(!gated.contains(1L), "boilerplate must fall to the compression gate")
    assert(gated.contains(2L), "prose must survive")
    val off = CorpusPipeline.curate(docs, minQuality = 0.1, nearDupMinSim = 0.99,
      maxDocFreq = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(off.contains(1L), "gate off by default: boilerplate passes this stage")
  }

  test("redactPii masks emails, urls, and digit runs; count matches") {
    val docs = Seq(
      (1L, "write to jane.doe+x@corp.example.org today"),
      (2L, "see https://a.example/path?q=1 and http://b.example for docs"),
      (3L, "call (415) 555-0199 or 555 123 4567 now"),
      (4L, "clean prose with no pii at all"),
      (5L, "")).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        TextAnalytics.redactPii($"text").as("red"),
        TextAnalytics.piiCount($"text").as("n"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == "write to <EMAIL> today" && out(1L)._2 == 1L)
    assert(out(2L)._1 == "see <URL> and <URL> for docs" && out(2L)._2 == 2L)
    assert(out(3L)._1 == "call <NUMBER> or <NUMBER> now" && out(3L)._2 == 2L)
    assert(out(4L) == (("clean prose with no pii at all", 0L)))
    assert(out(5L) == (("", 0L)))
  }

  test("curate with scrub: masks pii and drops chrome-only pages pre-gate") {
    val prose = "The quarterly report outlines revenue growth across " +
      "three regions with costs partially offsetting enterprise gains."
    val docs = Seq(
      (1L, s"MENU HOME\n$prose Contact ops@corp.example today.\nSign up"),
      (2L, "HOME\nABOUT\nCookie notice\nBuy now"), // chrome-only page
      (3L, prose)).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, minQuality = 0.5, nearDupMinSim = 0.99,
      maxDocFreq = 1000L, scrub = true, c4MinWords = 3)
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.contains(1L) && byId(1L).contains("<EMAIL>")
      && !byId(1L).contains("MENU"), "kept page is cleaned and masked")
    assert(!byId.contains(2L), "chrome-only page fails the quality gate post-clean")
    assert(byId.contains(3L))
  }

  test("c4LineClean keeps punctuated prose lines, drops chrome") {
    val page = Seq(
      "HOME ABOUT CONTACT",
      "Accept all cookies",
      "This is a real sentence about the product.",
      "Is it short?",        // ends in ? but only 3 words -> kept at default 3
      "No",
      "Buy now").mkString("\n")
    val out = spark.range(1)
      .select(TextAnalytics.c4LineClean(lit(page)).as("c"))
      .as[String].head()
    assert(out == "This is a real sentence about the product.\nIs it short?")
    // nothing survives -> empty string, not null
    val none = spark.range(1)
      .select(TextAnalytics.c4LineClean(lit("MENU\nFOOTER")).as("c"))
      .as[String].head()
    assert(none == "")
  }

  // ------------------------------------------------- bigram-LM perplexity

  private lazy val lmTarget = Seq(
    (100L, "the cat sat on the mat and the cat slept"),
    (101L, "the dog sat on the mat and the dog barked"),
    (102L, "the cat and the dog sat on the mat")).toDF("doc_id", "text")

  test("bigramLmScore: target-like prose scores lower cross-entropy than noise") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),          // pure target phrasing
      (1L, "zq xv wk jj qqq zzz plo ikm"),     // out-of-vocab noise
      (2L, "the"),                             // 1 token: no bigram, no row
      (3L, "")).toDF("doc_id", "text")
    val scored = TextAnalytics.bigramLmScore(docs, lmTarget)
    val byId = scored.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId.keySet == Set(0L, 1L), "sub-bigram docs emit no row")
    assert(byId(0L)._1 == 5 && byId(1L)._1 == 7, "n_scored = bigram count")
    val ce0 = -byId(0L)._2.toDouble / byId(0L)._1
    val ce1 = -byId(1L)._2.toDouble / byId(1L)._1
    assert(ce0 < ce1 / 2,
      s"target-like prose must score far lower cross-entropy: $ce0 vs $ce1")
  }

  test("bigramLmScore matches a hand-computed interpolated bigram model") {
    // target "a b a b": uni c(a)=2 c(b)=2, T=4, V=2; bi c(a,b)=2 c(b,a)=1;
    // ctx(a)=2 ctx(b)=1. Score "a b": p = (2 + p1(b)) / (2 + 1),
    // p1(b) = (2+1)/(4+2+1) = 3/7
    val target = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val doc = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = TextAnalytics.bigramLmScore(doc, target).head()
    val expected = math.round(math.log((2.0 + 3.0 / 7.0) / 3.0) * 1e6)
    assert(got.getLong(1) == 1L && got.getLong(2) == expected,
      s"got ${got.getLong(2)}, expected $expected")
  }

  test("curate with the lm gate drops only the high-perplexity doc") {
    val docs = Seq(
      (0L, "the cat sat on the mat and the cat slept on the mat today fine."),
      (1L, "zq xv wk jj qqq zzz plo ikm zq xv wk jj qqq zzz plo ikm here."))
      .toDF("doc_id", "text")
    val kept = CorpusPipeline.curate(docs, minQuality = 0.0, maxDocFreq = 1000L,
      lmTarget = Some(lmTarget), maxCrossEntropy = 3.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L), s"kept=$kept")
    // gate off by default: both survive
    val all = CorpusPipeline.curate(docs, minQuality = 0.0, maxDocFreq = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(0L, 1L))
  }

  test("perplexity view: exp(-logp/n/1e6), deterministic across runs") {
    val docs = Seq((0L, "the cat sat on the mat")).toDF("doc_id", "text")
    val p = TextAnalytics.perplexity(TextAnalytics.bigramLmScore(docs, lmTarget))
      .select("ppl").as[Double].head()
    assert(p > 1.0 && p.isFinite)
    val p2 = TextAnalytics.perplexity(TextAnalytics.bigramLmScore(docs, lmTarget))
      .select("ppl").as[Double].head()
    assert(p == p2)
  }

  // two sources with deliberately shifted score distributions: a global
  // threshold at any value either starves b or floods from a
  private def calibCorpus = Seq(
    (0L, "a", 0.9), (1L, "a", 0.8), (2L, "a", 0.7), (3L, "a", 0.6),
    (4L, "a", 0.5), (10L, "b", 0.4), (11L, "b", 0.3), (12L, "b", 0.2),
    (13L, "b", 0.1), (14L, "b", 0.05)).toDF("doc_id", "source", "score")

  test("calibrateScores keeps the top fraction of EVERY source") {
    val kept = TextAnalytics
      .calibrateScores(calibCorpus, "source", "score", "doc_id", keepFrac = 0.4)
      .where(col("keep")).select("doc_id").as[Long].collect().toSet
    // top 2 of 5 per source (pct_rank 0.0 and 0.25 < 0.4)
    assert(kept == Set(0L, 1L, 10L, 11L))
  }

  test("calibrateScores pct_rank is the (rank-1)/(n-1) law with id ties") {
    val tied = Seq((0L, "a", 0.5), (1L, "a", 0.5), (2L, "a", 0.5))
      .toDF("doc_id", "source", "score")
    val pr = TextAnalytics
      .calibrateScores(tied, "source", "score", "doc_id", keepFrac = 0.5)
      .orderBy("doc_id").select("pct_rank").as[Double].collect().toSeq
    // percent_rank ties share a rank only when the FULL ordering ties;
    // doc_id breaks them, so ranks are 0, 0.5, 1.0
    assert(pr == Seq(0.0, 0.5, 1.0))
  }

  test("calibrateScoresApprox keeps the exact set ± the cut element") {
    val exact = TextAnalytics
      .calibrateScores(calibCorpus, "source", "score", "doc_id", keepFrac = 0.4)
      .where(col("keep")).select("doc_id").as[Long].collect().toSet
    val approx = TextAnalytics
      .calibrateScoresApprox(calibCorpus, "source", "score", keepFrac = 0.4)
      .where(col("keep")).select("doc_id").as[Long].collect().toSet
    // the approx cut is an actual element of each source's distribution,
    // so the inclusive gate may keep that one element beyond the exact set
    // — never fewer, never more than one extra per source
    assert(exact.subsetOf(approx), s"approx=$approx must cover exact=$exact")
    val extraPerSource = (approx -- exact).groupBy(id => if (id < 10) "a" else "b")
    assert(extraPerSource.values.forall(_.size <= 1),
      s"at most the cut element itself may be extra, got $extraPerSource")
  }

  test("calibrateScoresApprox: a pre-existing cut column shares ONE contract across both regimes") {
    // ADVICE r11: the literal-chain regime REPLACED a caller's stray
    // `cut` column (withColumn's law) while the broadcast-join regime
    // emitted a duplicate, ambiguous `cut` — behavior silently diverged
    // across the MaxLiteralCutSources boundary. Both must replace.
    val stray = calibCorpus.withColumn("cut", lit(-999.0))
    val lit_ = TextAnalytics.calibrateScoresApprox(stray, "source", "score", 0.4)
    assert(lit_.columns.count(_ == "cut") == 1)
    assert(lit_.where(col("cut") === -999.0).count() == 0,
      "the stray cut must be REPLACED in the literal regime")
    // the broadcast regime: > MaxLiteralCutSources distinct sources
    val wide = spark.range(2000).select(
      col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(400))).as("source"),
      (pmod(col("id"), lit(5)) / 4.0).as("score"))
    val wideStray = wide.withColumn("cut", lit(-999.0))
    val bc = TextAnalytics.calibrateScoresApprox(wideStray, "source", "score", 0.4)
    assert(bc.columns.count(_ == "cut") == 1,
      s"broadcast regime must not emit a duplicate cut: ${bc.columns.toSeq}")
    assert(bc.where(col("cut") === -999.0).count() == 0)
    val keptStray = bc.where(col("keep")).select("doc_id").as[Long].collect().toSet
    val keptClean = TextAnalytics.calibrateScoresApprox(wide, "source", "score", 0.4)
      .where(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(keptStray == keptClean, "the stray column must not change the keep set")
    // and the emitted-name guard refuses a score column literally named cut
    val e = intercept[IllegalArgumentException] {
      TextAnalytics.calibrateScoresApprox(
        stray.withColumnRenamed("score", "cut"), "source", "cut", 0.4)
    }
    assert(e.getMessage.contains("rename"))
  }

  test("calibrateScoresApprox: null sources and all-null score groups") {
    val df = Seq[(Long, Option[String], Option[Double])](
      (0L, Some("a"), Some(0.9)), (1L, Some("a"), Some(0.5)),
      (2L, Some("a"), Some(0.1)),
      (3L, None, Some(0.8)), (7L, None, Some(0.4)), // null source = own group
      (8L, None, Some(0.2)),
      (4L, Some("z"), None), (5L, Some("z"), None), // all-null scores: no cut
      (6L, Some("a"), None) //                         null score in a scored group
    ).toDF("doc_id", "source", "score")
    val out = TextAnalytics
      .calibrateScoresApprox(df, "source", "score", keepFrac = 0.4)
    val kept = out.where(col("keep")).select("doc_id").as[Long].collect().toSet
    // the null-source group is calibrated like any other source; rows
    // that cannot be ranked (null score, or a group with no cut) are
    // explicitly dropped, never crash and never fall through to keep.
    // Boundary elements follow the documented "± the cut element" law, so
    // only the clear top/bottom of each group is pinned here.
    assert(kept.contains(0L) && !kept.contains(2L))
    assert(kept.contains(3L), "null-source group must keep its top")
    assert(!kept.contains(8L), "null-source group must drop its bottom")
    assert(!kept.contains(4L) && !kept.contains(5L),
      "an all-null-score source has no cut: keep = false")
    assert(!kept.contains(6L), "a null score cannot pass any cut")
    assert(out.count() == 9, "no rows lost")
  }

  test("calibrateScoresApprox past the literal bound: broadcast cut join, same keep law") {
    // a few thousand sources would make the literal when-chain an
    // O(#sources)-deep expression tree (round-10 advice); past the bound
    // the cuts must broadcast-join with UNCHANGED semantics — including
    // the null-source group and an all-null-score group
    val n = graft.ops.TextAnalytics.MaxLiteralCutSources * 12 // 3072 sources
    val rows = (0 until n).flatMap { s =>
      val src = if (s == 0) None else Some(s"src_$s")
      if (s == 1) Seq((s * 10L, src, Option.empty[Double]),
        (s * 10L + 1, src, Option.empty[Double]))
      else Seq((s * 10L, src, Some(0.9)), (s * 10L + 1, src, Some(0.1)))
    }
    val df = rows.toDF("doc_id", "source", "score").repartition(8)
    val out = graft.ops.TextAnalytics
      .calibrateScoresApprox(df, "source", "score", keepFrac = 0.4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "past the bound the cut lookup must be a broadcast join, not a literal chain")
    val kept = out.where(col("keep")).select("doc_id").as[Long].collect().toSet
    // every scored source keeps exactly its top element (keepFrac 0.4 of 2)
    assert(kept == (0 until n).filter(_ != 1).map(_ * 10L).toSet,
      s"keep law drifted at scale: ${kept.size} kept")
    assert(out.count() == rows.size.toLong, "no rows lost through the join path")
    // below the bound the plan is STILL the join-free literal chain
    val small = Seq((0L, "a", 0.9), (1L, "a", 0.1)).toDF("doc_id", "source", "score")
    val smallPlan = graft.ops.TextAnalytics
      .calibrateScoresApprox(small, "source", "score", keepFrac = 0.4)
      .queryExecution.executedPlan.toString
    assert(!smallPlan.contains("Join"), "bounded regime must keep the scan-stage literal chain")
  }

  test("calibrateScoresApprox scoring stage adds no shuffle") {
    val cal = TextAnalytics.calibrateScoresApprox(
      calibCorpus.repartition(3), "source", "score", keepFrac = 0.4)
    // the cutoff lookup is a literal CASE column — the keep flag must not
    // introduce an Exchange beyond the input's own repartition
    val plan = cal.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scan-stage gate must not shuffle:\n$plan")
  }

  test("collocations: hand-computed PMI over exact counts") {
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val got = TextAnalytics.collocations(docs, minPairCount = 1L)
      .orderBy("w1", "w2")
      .select("w1", "w2", "pair_count", "w1_count", "w2_count", "pmi")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // uni: a=3 b=2 c=1, N_uni=6; bi: (a,b)=2 (a,c)=1, N_bi=3
    // pmi(a,b) = ln(2*36 / (3*3*2)) = ln 4; pmi(a,c) = ln(36/9) = ln 4
    val ln4 = math.round(math.log(4.0) * 1e6) / 1e6
    assert(got == Seq(
      ("a", "b", 2L, 3L, 2L, ln4),
      ("a", "c", 1L, 3L, 1L, ln4)))
  }

  test("collocations: minPairCount prunes hapax bigrams; no cross-doc adjacency") {
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val pruned = TextAnalytics.collocations(docs, minPairCount = 2L)
      .select("w1", "w2", "pmi").as[(String, String, Double)].collect().toSeq
    assert(pruned.map(p => (p._1, p._2)) == Seq(("a", "b")))
    // the prune is a REPORTING knob: N_bi sums before it, so a pair's
    // PMI is identical at any minPairCount it survives
    val unpruned = TextAnalytics.collocations(docs, minPairCount = 1L)
      .where($"w1" === "a" && $"w2" === "b")
      .select("pmi").as[Double].head()
    assert(pruned.head._3 == unpruned)
    // adjacency never spans documents
    val split = Seq("x", "y").toDF("text")
    assert(TextAnalytics.collocations(split, minPairCount = 1L).count() == 0)
    intercept[IllegalArgumentException] {
      TextAnalytics.collocations(docs, minPairCount = 0L)
    }
  }
}
