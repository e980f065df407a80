package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (builder brief:
  * language-ID, quality scoring, token counting, fingerprinting, top terms).
  *
  * Every operator is pure column algebra (codegen'd, scan-stage) except the
  * top-terms aggregate, whose one shuffle is keyed by (group, token).
  */
object TextAnalytics {

  /** Null text is an empty document, not a null metric — curation must
    * score and count every row (a null-propagating metric silently drops
    * rows from downstream filters).
    */
  private def safe(text: Column): Column = coalesce(text, lit(""))

  /** Whitespace token count. */
  def tokenCount(text0: Column): Column = {
    val text = safe(text0)
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))
  }

  /** BPE-ish subword count: word pieces + standalone punctuation, the
    * shape tokenizers like tiktoken (pinned by the reference,
    * requirements.txt:10) produce to first order.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(safe(text), lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Heuristic language ID over a closed language set: count stopword
    * markers per language, pick the max (ties → language name order).
    * N-gram/stopword scoring is the standard offline heuristic; scores are
    * integers so argmax is exactly reproducible.
    */
  def langId(text0: Column): Column = {
    val text = safe(text0)
    def hits(marker: String): Column =
      (length(text) - length(replace(text, lit(marker), lit("")))) / marker.length
    val scored = map(
      lit("en"), hits(" the ") + hits(" and ") + hits(" of "),
      lit("es"), hits(" el ") + hits(" la ") + hits(" los "),
      lit("de"), hits(" der ") + hits(" und ") + hits(" die "),
      lit("fr"), hits(" le ") + hits(" et ") + hits(" les "),
      lit("zh"), length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")).cast("double")
    )
    // argmax by (score desc, lang asc)
    val entries = map_entries(scored)
    val best = array_sort(
      entries,
      (a, b) => when(a.getField("value") > b.getField("value"), -1)
        .when(a.getField("value") < b.getField("value"), 1)
        .when(a.getField("key") < b.getField("key"), -1)
        .when(a.getField("key") > b.getField("key"), 1)
        .otherwise(0))
    element_at(best, 1).getField("key")
  }

  /** Quality score in [0,1]: blend of length saturation, alpha ratio,
    * punctuation penalty, and mean-token-length sanity — the standard
    * cheap pre-filter for LLM corpus cleaning.
    */
  def qualityScore(text0: Column): Column = {
    val text = safe(text0)
    val len = length(text).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val alphaRatio = when(len > 0, alpha / len).otherwise(lit(0.0))
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double")
    val punctPenalty = when(len > 0, least(punct / len * lit(4.0), lit(1.0))).otherwise(lit(0.0))
    val toks = tokenCount(text).cast("double")
    val meanTok = when(toks > 0, len / toks).otherwise(lit(0.0))
    val tokScore = when(meanTok >= 3 && meanTok <= 12, lit(1.0)).otherwise(lit(0.5))
    round(lenScore * lit(0.4) + alphaRatio * lit(0.3) +
      (lit(1.0) - punctPenalty) * lit(0.1) + tokScore * lit(0.2), 6)
  }

  /** Deflate compression ratio (compressed/raw bytes), the repetitiveness
    * signal public curation pipelines gate on (Gopher/RefinedWeb-style
    * rules): boilerplate and keyword-stuffed spam compress far below
    * natural prose, near-random noise compresses above it. Deterministic
    * (fixed level + strategy); evaluated by the native
    * [[graft.functions.CompressionRatio]] expression (SQL name
    * `compression_ratio`) per row inside the scan stage. Empty/null text
    * → 1.0 (neutral: gates on "ratio too low" must not drop empties here —
    * length filters own that).
    */
  def compressionRatio(text: Column): Column =
    graft.functions.TextExpressions.compressionRatio(text)

  /** Stable document fingerprint: md5 of the normalized text (lowercased,
    * punctuation stripped, whitespace collapsed) — whitespace/case/punct
    * variants collide intentionally (near-dup pre-key).
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(regexp_replace(lower(safe(text)), "[^a-z0-9\\s]", " "), "\\s+", " ")
      .cast("binary"))

  /** Polynomial rolling hash of the normalized text, mod 2^31-1 — the
    * order-sensitive cousin of [[fingerprintMd5]]; pure column algebra via
    * `aggregate` so it stays inside codegen (ANSI-safe: stays < 2^62).
    */
  def fingerprintRolling(text: Column): Column = {
    val norm =
      regexp_replace(regexp_replace(lower(safe(text)), "[^a-z0-9\\s]", " "), "\\s+", " ")
    // Explicit per-position codes (not split-by-empty-regex, whose
    // trailing-empty semantics differ between engines).
    val codes = transform(
      sequence(lit(1), length(norm)),
      i => ascii(call_function("substring", norm, i, lit(1))).cast("long"))
    aggregate(codes, lit(0L), (h, c) => pmod(h * 31 + c, lit(2147483647L)))
  }

  /** PII redaction (the C4/RefinedWeb-style scrub pass): masks emails,
    * URLs, and long digit runs (phone/account numbers) with typed
    * placeholder tokens. Pure per-row `regexp_replace` chain — runs
    * inside the scan stage's codegen, zero shuffle, trivially 100 TB-safe.
    * Patterns deliberately use the regex intersection of Java and RE2
    * (no lookaround, no backrefs) so the oracle recomputes them exactly.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(safe(text),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "[+(]?[0-9][0-9 ().-]{7,}[0-9]", "<NUMBER>")
  }

  /** Count of PII spans [[redactPii]] would mask — the audit column to
    * log alongside the scrub (redaction without measurement is how silent
    * corpus damage ships).
    */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(safe(text),
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" +
        "|https?://[^\\s]+|[+(]?[0-9][0-9 ().-]{7,}[0-9]"), lit(0))).cast("long")

  /** C4-style line-level boilerplate filter (Raffel et al. 2020 §2.2):
    * keep only lines that end in terminal punctuation AND carry at least
    * `minWords` whitespace tokens — drops nav menus, cookie banners, and
    * list cruft while keeping prose. Returns the re-joined text (empty
    * string when no line survives). Higher-order-function column algebra
    * (`filter` over `split`) — per-row, codegen'd, zero shuffle.
    */
  def c4LineClean(text: Column, minWords: Int = 3): Column = {
    val kept = filter(
      split(safe(text), "\n"),
      l => trim(l).rlike("[.!?\"']$") &&
        size(split(trim(l), "\\s+")) >= minWords)
    array_join(kept, "\n")
  }

  /** Top-N terms per group: tokenize → explode → count → rank. The shuffle
    * is keyed (group, token) with map-side partial counts, then a second
    * tiny shuffle on group for the rank — the scalable word-count shape.
    */
  def topTermsPerGroup(
      docs: DataFrame,
      groupCol: String,
      textCol: String = "text",
      n: Int = 5): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("term"))
    docs
      .select(col(groupCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= n)
      .orderBy(col(groupCol), col("rnk"))
  }

  // --------------------------------------- CMS term-frequency sketch tables

  /** Per-group term-frequency count-min sketches — the frequency analog of
    * the x7b HLL pattern: ONE corpus pass builds a sketch per group (Spark's
    * built-in `count_min_sketch` aggregate — map-side partial sketches,
    * shuffle carries sketch bytes, never terms); persist the result and all
    * later frequency questions are answered from the sketch TABLE. Same
    * eps/confidence/seed across groups so sketches stay mergeable.
    */
  def termSketches(
      docs: DataFrame,
      groupCol: String,
      textCol: String = "text",
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    docs
      .select(col(groupCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col(groupCol))
      .agg(count_min_sketch(col("term"), lit(eps), lit(confidence), lit(seed))
        .as("sketch"))

  /** Point-frequency estimates for `terms` from a sketch table: merge the
    * group sketches (`cms_merge` — counter-wise exact) and probe once per
    * term (`cms_estimate`). Touches ONLY sketch bytes — the corpus is not
    * scanned, which is the entire point at 100 TB. Estimates are upper
    * bounds within eps·N at the sketch's confidence.
    */
  def cmsTermEstimates(
      sketches: DataFrame,
      terms: DataFrame,
      sketchCol: String = "sketch",
      termCol: String = "term"): DataFrame = {
    graft.functions.CmsFunctions.register(sketches.sparkSession)
    sketches
      .agg(call_function("cms_merge", col(sketchCol)).as("__sk"))
      .crossJoin(broadcast(terms)) // 1 row × candidate terms
      .withColumn("est_cnt", call_function("cms_estimate", col("__sk"), col(termCol)))
      .drop("__sk")
  }

  /** Gopher document-level quality rules (Rae et al. 2021, appendix A —
    * the rule set Dolma/RefinedWeb reuse): per document, the seven
    * repetition-free structural gates —
    *
    *   - `n_words` in [`minWords`, `maxWords`] (default 50..100,000),
    *   - mean word length in [3, 10] characters,
    *   - symbol-to-word ratio ≤ 0.1 (symbols: `#`, `...`, `…`),
    *   - ≤ 90% of lines starting with a bullet (`-`, `*`, `•`, `‣`, `▪`),
    *   - ≤ 30% of lines ending with an ellipsis,
    *   - ≥ 80% of words containing at least one alphabetic character,
    *   - ≥ 2 of the 8 required English stopwords present
    *     (the/be/to/of/and/that/have/with — the cheap language check).
    *
    * Emits the measured metrics, one boolean per rule, and the AND of all
    * rules as `pass_gopher`. Pure per-row column algebra over `split` /
    * `filter` / `aggregate` — scan-stage, codegen, zero shuffle; every
    * regex is in the Java∩RE2∩DuckDB intersection (no lookaround) so an
    * oracle can recompute all seven rules verbatim. Words are whitespace
    * tokens with empties dropped (the [[tokenCount]] convention); lines
    * are `\n` splits kept as-is, so blank lines count in the line
    * denominators exactly as the paper's reference implementation does.
    */
  def gopherRules(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val text = safe(col(textCol))
    val words = filter(split(text, "\\s+"), w => length(w) > 0)
    val nWords = size(words).cast("long")
    val charSum = aggregate(words, lit(0L), (a, w) => a + length(w))
    val meanLen = when(nWords > 0, charSum.cast("double") / nWords)
      .otherwise(lit(0.0))
    val nSymbols = size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))
      .cast("long")
    val symbolRatio = when(nWords > 0, nSymbols.cast("double") / nWords)
      .otherwise(lit(0.0))
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletFrac = when(nLines > 0,
      size(filter(lines, l => trim(l).rlike("^[-*•‣▪]"))).cast("double") / nLines)
      .otherwise(lit(0.0))
    val ellipsisFrac = when(nLines > 0,
      size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines)
      .otherwise(lit(0.0))
    val alphaFrac = when(nWords > 0,
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") / nWords)
      .otherwise(lit(0.0))
    val lowered = transform(words, w => lower(w))
    val nStop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(s => when(array_contains(lowered, s), 1L).otherwise(0L))
      .reduce(_ + _)
    docs.select(
        col(idCol),
        nWords.as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(symbolRatio, 6).as("symbol_ratio"),
        round(bulletFrac, 6).as("bullet_frac"),
        round(ellipsisFrac, 6).as("ellipsis_frac"),
        round(alphaFrac, 6).as("alpha_frac"),
        nStop.as("n_stop"))
      .withColumn("pass_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_mean_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("pass_symbols", col("symbol_ratio") <= 0.1)
      .withColumn("pass_bullets", col("bullet_frac") <= 0.9)
      .withColumn("pass_ellipsis", col("ellipsis_frac") <= 0.3)
      .withColumn("pass_alpha", col("alpha_frac") >= 0.8)
      .withColumn("pass_stop", col("n_stop") >= 2)
      .withColumn("pass_gopher",
        col("pass_words") && col("pass_mean_len") && col("pass_symbols") &&
          col("pass_bullets") && col("pass_ellipsis") && col("pass_alpha") &&
          col("pass_stop"))
  }

  /** Gopher repetition rules (Rae et al. 2021, appendix A — the
    * within-document half; [[gopherRules]] owns the structural half):
    * documents dominated by repeated lines or repeated n-grams are
    * machine-generated boilerplate. Per document:
    *
    *   - `dup_line_frac` = (lines − distinct lines) / lines, over
    *     non-empty trimmed lines — i.e. every occurrence beyond a line's
    *     first is a duplicate; gate ≤ 0.30,
    *   - `dup_line_char_frac` = character mass of those beyond-first
    *     occurrences / total line characters; gate ≤ 0.20. Both are
    *     LINEAR per-row array algebra (total minus distinct — no pairwise
    *     loop), scan-stage, zero shuffle,
    *   - `top_ngram_frac(n)`, n = 2..4: the heaviest n-gram's character
    *     mass (count × gram length) over the total n-gram character mass
    *     of the doc; gates ≤ 0.20 / 0.18 / 0.16,
    *   - `dup_ngram_frac(n)`, n = 5..10: character mass of n-grams
    *     occurring ≥ 2 times over total n-gram mass; gates ≤ 0.15 step
    *     −0.01 down to 0.10.
    *
    * The gram tier is ONE exploded `(doc, n, gram)` stream for all nine
    * n values — one map-side-combined shuffle keyed (doc, n, gram), one
    * tiny per-(doc, n) aggregate, then a conditional pivot back to one
    * row per doc; corpora stream through it at any scale. Docs shorter
    * than n words have no n-grams: their fractions are 0 (no repetition
    * evidence), via the left join + coalesce — while a doc with only a
    * handful of words puts most of its mass in one gram and trips the
    * top-gram gates by construction, exactly as in the paper (the
    * word-count gate in [[gopherRules]] owns short docs).
    * `pass_repetition` is the AND of all eleven gates.
    */
  def gopherRepetition(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = safe(col(textCol))
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    val nLines = size(lines).cast("long")
    val dLines = size(array_distinct(lines)).cast("long")
    val lineChars = aggregate(lines, lit(0L), (a, l) => a + length(l))
    val dLineChars = aggregate(array_distinct(lines), lit(0L),
      (a, l) => a + length(l))
    val lineMetrics = docs.select(
      col(idCol),
      when(nLines > 0, (nLines - dLines).cast("double") / nLines)
        .otherwise(lit(0.0)).as("dup_line_frac"),
      when(lineChars > 0, (lineChars - dLineChars).cast("double") / lineChars)
        .otherwise(lit(0.0)).as("dup_line_char_frac"))

    val words = filter(split(text, "\\s+"), w => length(w) > 0)
    val ns = (2 to 10)
    // one stream of (doc, n, gram) for every n — explode(map) keeps it a
    // single generator pass over each document
    val gramsByN = map_from_arrays(
      array(ns.map(n => lit(n)): _*),
      array(ns.map { n =>
        when(size(words) >= n,
          transform(sequence(lit(0), size(words) - n),
            i => concat_ws(" ", call_function("slice", words, i + 1, lit(n)))))
          .otherwise(array().cast("array<string>"))
      }: _*))
    val grams = docs
      .select(col(idCol), explode(gramsByN).as(Seq("n", "grams")))
      .select(col(idCol), col("n"), explode(col("grams")).as("gram"))
    val perGram = grams.groupBy(col(idCol), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("mass", col("cnt") * length(col("gram")).cast("long"))
    val perN = perGram.groupBy(col(idCol), col("n"))
      .agg(sum(col("mass")).as("total_mass"),
        max(col("mass")).as("top_mass"),
        sum(when(col("cnt") >= 2, col("mass")).otherwise(lit(0L))).as("dup_mass"))
    def frac(n: Int, num: Column): Column =
      round(coalesce(
        max(when(col("n") === n, num.cast("double") / col("total_mass"))),
        lit(0.0)), 6)
    val gramMetrics = perN.groupBy(col(idCol)).agg(
      frac(2, col("top_mass")).as("top_2gram_frac"),
      frac(3, col("top_mass")).as("top_3gram_frac"),
      frac(4, col("top_mass")).as("top_4gram_frac"),
      frac(5, col("dup_mass")).as("dup_5gram_frac"),
      frac(6, col("dup_mass")).as("dup_6gram_frac"),
      frac(7, col("dup_mass")).as("dup_7gram_frac"),
      frac(8, col("dup_mass")).as("dup_8gram_frac"),
      frac(9, col("dup_mass")).as("dup_9gram_frac"),
      frac(10, col("dup_mass")).as("dup_10gram_frac"))
    val topGates = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupGates = Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12,
      9 -> 0.11, 10 -> 0.10)
    val withGram = lineMetrics.join(gramMetrics, Seq(idCol), "left")
      .select(Seq(col(idCol),
        round(col("dup_line_frac"), 6).as("dup_line_frac"),
        round(col("dup_line_char_frac"), 6).as("dup_line_char_frac")) ++
        topGates.map { case (n, _) =>
          coalesce(col(s"top_${n}gram_frac"), lit(0.0)).as(s"top_${n}gram_frac") } ++
        dupGates.map { case (n, _) =>
          coalesce(col(s"dup_${n}gram_frac"), lit(0.0)).as(s"dup_${n}gram_frac") }: _*)
    val gates =
      (col("dup_line_frac") <= 0.30) +: (col("dup_line_char_frac") <= 0.20) +:
        (topGates.map { case (n, g) => col(s"top_${n}gram_frac") <= g } ++
         dupGates.map { case (n, g) => col(s"dup_${n}gram_frac") <= g })
    withGram.withColumn("pass_repetition", gates.reduce(_ && _))
  }

  /** Per-document analysis record: all scalar analytics in one projection. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpeish", bpeishTokenCount(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fp_md5", fingerprintMd5(col(textCol)))
      .withColumn("fp_roll", fingerprintRolling(col(textCol)))

  // ------------------------------------ bigram-LM perplexity gate (CCNet)

  /** Bigram language-model cross-entropy scoring — the CCNet-style
    * perplexity quality gate (Wenzek et al. 2020, "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data": score raw docs
    * with an LM trained on a trusted target corpus; low perplexity ≈
    * target-like prose, high = noise/boilerplate/wrong-language). KenLM's
    * native 5-gram model is re-expressed at the weight class a declarative
    * engine wants: both model "tables" are DataFrames (unigrams ≤ target
    * vocab, bigrams ≤ target token count) and scoring is two hash joins +
    * one aggregate — no native library, no model file.
    *
    * Probability model (add-α interpolated backoff; every position scores
    * a finite log-prob, unseen words included):
    * {{{
    *   p(w2|w1) = (c(w1 w2) + α·p1(w2)) / (ctx(w1) + α)
    *   p1(w)    = (c(w) + 1) / (T + V + 1)
    * }}}
    * where `ctx(w1)` counts bigram positions starting with w1, `T` is
    * total target tokens and `V` distinct target vocab (the +1 slot is
    * every unseen word's share).
    *
    * Per-position log-probs are quantized to the 1e-6 integer grid (the
    * [[TrainingData.importanceWeights]] discipline): the per-doc sum is
    * exact integer algebra — deterministic, partial-aggregation-order-
    * independent, and recomputable verbatim by the DuckDB oracle. Returns
    * `(id, n_scored, logp_q)` with one row per raw doc holding ≥ 1 bigram
    * (shorter docs carry no signal). Cross-entropy = `-logp_q / n_scored
    * / 1e6`, perplexity = `exp` of that — left to the caller so the
    * oracled artifact stays integer-exact; see [[perplexity]].
    *
    * Scale: the model tables are broadcast while they provably fit
    * (`maxBroadcastModel` probe — same guard as the ANN candidate joins)
    * and degrade to shuffle joins past it; the raw corpus streams through
    * the two joins + one keyed aggregate, shuffling only its bigram
    * stream. Nothing corpus-sized reaches the driver.
    */
  def bigramLmScore(
      docs: DataFrame,
      target: DataFrame,
      alpha: Double = 1.0,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBroadcastModel: Int = 4000000): DataFrame = {
    require(alpha > 0, "bigramLmScore: alpha must be positive")
    def toks(c: Column): Column =
      when(length(trim(c)) === 0, array())
        .otherwise(split(lower(trim(c)), "\\s+"))
    def bigrams(df: DataFrame, withId: Boolean): DataFrame = {
      val base = df.select(
        (if (withId) col(idCol) else lit(0L)).as("__id"), toks(col(textCol)).as("__t"))
      base.select(col("__id"),
        explode(when(size(col("__t")) >= 2,
          expr("transform(sequence(0, size(__t) - 2), i -> " +
            "struct(element_at(__t, i + 1) AS w1, element_at(__t, i + 2) AS w2))"))
          .otherwise(array())).as("bg"))
        .select(col("__id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    }
    // each model table is materialized before its size probe: the probe
    // is an action and the corpus-sized model aggregate would otherwise
    // run twice (the maybeBroadcast double-execution class)
    def guarded(df: DataFrame): DataFrame = {
      val mat = df.localCheckpoint(true)
      if (mat.limit(maxBroadcastModel + 1).count() <= maxBroadcastModel)
        broadcast(mat)
      else mat
    }
    val tgtTokens = target.select(explode(toks(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
    val uni = tgtTokens.groupBy(col("w").as("w2")).agg(count(lit(1)).as("c2"))
    val tgtBi = bigrams(target, withId = false)
    val bi = tgtBi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = bi.groupBy("w1").agg(sum(col("c12")).as("ctx1"))
    val totals = uni.agg(sum(col("c2")).as("tot_t"),
      count(lit(1)).as("vocab_v"))
    val scored = bigrams(docs, withId = true)
      .join(guarded(bi), Seq("w1", "w2"), "left")
      .join(guarded(ctx), Seq("w1"), "left")
      .join(guarded(uni), Seq("w2"), "left")
      .na.fill(0L, Seq("c12", "ctx1", "c2"))
      .crossJoin(totals)
      .withColumn("__p1",
        (col("c2") + 1) / (col("tot_t") + col("vocab_v") + 1))
      .withColumn("__logp_q",
        round(log((col("c12") + lit(alpha) * col("__p1"))
          / (col("ctx1") + lit(alpha))) * 1e6, 0).cast("long"))
    scored.groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_scored"), sum(col("__logp_q")).as("logp_q"))
  }

  /** Convenience view over [[bigramLmScore]] output: cross-entropy (nats)
    * and perplexity per doc — the thresholds CCNet buckets on.
    */
  def perplexity(scored: DataFrame): DataFrame =
    scored
      .withColumn("cross_entropy",
        -col("logp_q").cast("double") / col("n_scored") / 1e6)
      .withColumn("ppl", exp(col("cross_entropy")))

  /** Per-source score calibration (the FineWeb/Dolma mixing recipe): a
    * raw quality score is not comparable ACROSS sources — wiki prose and
    * forum posts sit on different score distributions, so one global
    * threshold starves whole sources. Normalize each doc's score to its
    * percentile WITHIN its source (`pct_rank` descending: 0.0 = best of
    * source) and gate on that, keeping the top `keepFrac` of every source.
    *
    * Exact path: one `percent_rank` window per source — a full sort of
    * each source partition. Ordering is (score desc, id asc), so ties are
    * deterministic and the emitted percentile is reproducible to the bit.
    */
  def calibrateScores(
      df: DataFrame,
      sourceCol: String,
      scoreCol: String,
      idCol: String,
      keepFrac: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("pct_rank", percent_rank().over(w))
      .withColumn("keep", col("pct_rank") < lit(keepFrac))
  }

  /** Scale path for [[calibrateScores]]: per-source approximate score
    * cutoffs (one aggregate pass, driver state = one double per source,
    * broadcast back as a literal map) and a scan-stage keep flag — no
    * per-source sort ever happens, so a skewed mega-source costs the same
    * as a small one. `accuracy` is `approx_percentile`'s knob (default
    * 1e4 ≈ 0.01% rank error); the keep fraction is approximate by exactly
    * that error, which is the right trade at corpus scale.
    */
  def calibrateScoresApprox(
      df: DataFrame,
      sourceCol: String,
      scoreCol: String,
      keepFrac: Double,
      accuracy: Int = 10000): DataFrame = {
    // Null-safe on both axes: a null SOURCE is its own calibrated group
    // (matched with isNull, since `===` never matches null), and a group
    // whose scores are all null yields a null percentile — those groups
    // get no cut, and the explicit keep policy is: no cut, or a null
    // score, means keep = false (a row that cannot be ranked within its
    // source is not silently admitted).
    require(sourceCol != "cut" && scoreCol != "cut" &&
      sourceCol != "keep" && scoreCol != "keep",
      "calibrateScoresApprox emits `cut` and `keep` — rename the input column")
    val cuts = df
      .groupBy(col(sourceCol))
      .agg(percentile_approx(
        col(scoreCol), lit(1.0 - keepFrac), lit(accuracy)).as("cut"))
      .collect()
      .map(r => r.get(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    // One output contract across BOTH lookup regimes: a caller whose frame
    // already carries a `cut` column gets it REPLACED (withColumn's law) —
    // without the drop, the broadcast join would emit a duplicate,
    // ambiguous `cut` and behavior would silently diverge across the
    // MaxLiteralCutSources boundary (ADVICE r11).
    val base = df.drop("cut")
    // Two physically different cut-lookup shapes, same semantics (a
    // null-safe exact match on the source): up to the threshold the cuts
    // fold into a literal when-chain (scan-stage column algebra, zero
    // joins — the audited x25 plan); past it that chain would be an
    // O(#sources)-deep expression tree (analyzer and codegen walk it per
    // row — a 10k-source corpus would pay a 10k-deep tree), so the cut
    // table broadcast-joins instead: one tiny build side, still no
    // per-source sort anywhere.
    val withCut =
      if (cuts.length <= MaxLiteralCutSources) {
        val cutCol = cuts.foldLeft(lit(null).cast("double")) {
          case (acc, (src, Some(cut))) =>
            val matches =
              if (src == null) col(sourceCol).isNull
              else col(sourceCol) === lit(src)
            when(matches, lit(cut)).otherwise(acc)
          case (acc, (_, None)) => acc
        }
        base.withColumn("cut", cutCol)
      } else {
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "__cal_src", df.schema(sourceCol).dataType, nullable = true),
          org.apache.spark.sql.types.StructField(
            "cut", org.apache.spark.sql.types.DoubleType, nullable = true)))
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row](cuts.length)
        cuts.foreach { case (src, cut) =>
          rows.add(org.apache.spark.sql.Row(src, cut.map(Double.box).orNull))
        }
        base.join(broadcast(df.sparkSession.createDataFrame(rows, schema)),
            col(sourceCol) <=> col("__cal_src"), "left")
          .drop("__cal_src")
      }
    withCut.withColumn("keep",
      coalesce(col(scoreCol) >= col("cut"), lit(false)))
  }

  /** Literal-chain bound for [[calibrateScoresApprox]]'s cut lookup —
    * past this many distinct sources the cuts broadcast-join instead.
    */
  private[graft] val MaxLiteralCutSources = 256

  /** PMI collocation mining (Church & Hanks 1990) — multiword-expression
    * discovery over the corpus's adjacent bigrams: `pmi(a, b) =
    * ln(P(a b) · N_uni² / (N_bi · count(a) · count(b)))` folded as
    * `ln(pair·N_uni²) − ln(N_bi·cnt_a·cnt_b)` over exact integer counts,
    * rounded to 6 decimals (the b3 discipline: all float work happens
    * once, on exact integers both engines reproduce). Corpus analytics a
    * curation pipeline actually uses: high-PMI pairs are terms of art
    * ("monte carlo") worth protecting from token-level ops; low-PMI
    * high-frequency pairs are boilerplate indicators.
    *
    * `minPairCount` prunes the long tail BEFORE the joins (a hapax
    * bigram has meaningless PMI, and at corpus scale the tail IS the
    * data volume). Scale shape: one token explode (scan stage), one
    * bigram explode, three keyed aggregates, then two word-keyed hash
    * joins attaching unigram counts to the pruned pair table — never a
    * cross join, never a driver-side vocabulary.
    *
    * Bigram adjacency is WITHIN a document (no cross-doc pairs); tokens
    * under the [[graft.search.Bm25]] law.
    */
  def collocations(
      docs: DataFrame,
      textCol: String = "text",
      minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1,
      s"collocations: minPairCount $minPairCount must be >= 1")
    val toks = docs.select(
      graft.search.Bm25.tokensCol(col(textCol)).as("__t"))
    val uni = toks
      .select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val biAll = toks
      .where(size(col("__t")) > 1) // sequence(1, 0) descends — see BpeSpec
      .select(explode(expr(
        "transform(sequence(1, size(__t) - 1), " +
          "i -> struct(__t[i - 1] AS w1, __t[i] AS w2))")).as("__p"))
      .groupBy(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .agg(count(lit(1)).as("pair_count"))
    // N_bi is ALL adjacent bigrams, summed BEFORE the prune — P(a b)'s
    // denominator must not move when the reporting knob does (pruning
    // with a post-prune total would inflate every surviving pair's PMI
    // as minPairCount rises). Both totals are SCAN-STAGE token-count
    // sums (Σ|toks|, Σ max(|toks|−1, 0)) in ONE driver action — summing
    // the count tables instead re-ran the full explode + shuffle once
    // per total on top of the final action's own run (measured 275 s at
    // 10M docs; the token-sum form leaves the heavy shuffles to exactly
    // one computation each)
    val bi = biAll.where(col("pair_count") >= minPairCount)
    val tot = toks.agg(
      sum(size(col("__t")).cast("long")).as("nu"),
      sum(greatest(size(col("__t")) - 1, lit(0)).cast("long")).as("nb")).head
    val nUni = if (tot.isNullAt(0)) 0L else tot.getLong(0)
    val nBi = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    bi
      .join(uni.select(col("w").as("w1"), col("cnt").as("w1_count")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cnt").as("w2_count")), Seq("w2"))
      .select(col("w1"), col("w2"), col("pair_count"),
        col("w1_count"), col("w2_count"),
        round(
          log(col("pair_count").cast("double") * nUni * nUni) -
            log(lit(nBi).cast("double") * col("w1_count") * col("w2_count")),
          6).as("pmi"))
  }
}
