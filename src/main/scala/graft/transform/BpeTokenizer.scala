package graft.transform

/** Byte-pair-encoding tokenizer — the pure algorithm (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units";
  * the merge-table form used by GPT-2's tokenizer and HuggingFace
  * `tokenizers`). Training operates on a word-frequency table, NOT the
  * corpus: the table is vocabulary-sized, so the quadratic-ish merge loop
  * runs driver-side over KBs–MBs while the corpus itself is only touched
  * by the (distributed, per-row) encode. See `graft.ops.Bpe` for the
  * Spark wiring.
  *
  * Determinism contract (everything here is seed-free):
  *  - pair counts are exact integers over the word-frequency table;
  *  - the merge picked each round is max by (count, then LEXICOGRAPHIC
  *    pair order) — no hash-iteration order leaks into the result;
  *  - encoding applies merges strictly in rank order (lowest rank first,
  *    leftmost occurrence first), the standard BPE apply rule.
  *
  * Pretokenization is the engine-wide whitespace+lowercase convention
  * (same token boundaries as `TextAnalytics.tokenCount`); tokens never
  * cross a word boundary. No end-of-word marker: merges operate on plain
  * in-word character sequences, so `concat(encode(w)) == w` exactly
  * (asserted in BpeTokenizerSpec).
  */
object BpeTokenizer {

  /** An ordered merge table. `merges(i)` has rank i; lower rank = learned
    * earlier = applied first.
    */
  final case class Model(merges: Vector[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap

    /** Greedy BPE apply: repeatedly merge the lowest-rank adjacent pair
      * until none applies. O(|word| · merges-applied) with the simple
      * scan; words are short, this is the per-row hot path and allocates
      * only the working buffer.
      */
    def encodeWord(word: String): Vector[String] = {
      if (word.isEmpty) return Vector.empty
      var parts = word.map(_.toString).toVector
      var done = false
      while (!done && parts.length > 1) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i < parts.length - 1) {
          val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestAt = i }
          i += 1
        }
        if (bestAt < 0) done = true
        else parts = (parts.take(bestAt) :+ (parts(bestAt) + parts(bestAt + 1))) ++
          parts.drop(bestAt + 2)
      }
      parts
    }

    /** Whitespace-pretokenized encode of free text. */
    def encode(text: String): Vector[String] = {
      val t = text.trim.toLowerCase
      if (t.isEmpty) Vector.empty
      else t.split("\\s+").toVector.flatMap(encodeWord)
    }
  }

  /** Learn `numMerges` merges from a word-frequency table. Stops early
    * when the best remaining pair occurs fewer than `minFrequency` times
    * (merging a hapax buys nothing and burns vocabulary).
    */
  def train(
      wordFreqs: Iterable[(String, Long)],
      numMerges: Int,
      minFrequency: Long = 2L): Model = {
    require(numMerges >= 0, "BpeTokenizer.train: numMerges must be >= 0")
    require(minFrequency >= 1, "BpeTokenizer.train: minFrequency must be >= 1")
    // words as mutable symbol sequences, carrying their corpus frequency
    var words: Vector[(Vector[String], Long)] = wordFreqs.iterator
      .filter { case (w, n) => w.nonEmpty && n > 0 }
      .map { case (w, n) => (w.map(_.toString).toVector, n) }
      .toVector
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      // exact pair counts: every adjacent position, weighted by word freq
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (parts, n) =>
        var i = 0
        while (i < parts.length - 1) {
          val p = (parts(i), parts(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max by (count, then lexicographic pair) — deterministic under
        // any map iteration order
        val (pair, cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minFrequency) exhausted = true
        else {
          merges += pair
          val joined = pair._1 + pair._2
          words = words.map { case (parts, n) =>
            if (parts.length < 2) (parts, n)
            else {
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < parts.length) {
                if (i < parts.length - 1 &&
                  parts(i) == pair._1 && parts(i + 1) == pair._2) {
                  out += joined; i += 2
                } else { out += parts(i); i += 1 }
              }
              (out.result(), n)
            }
          }
          m += 1
        }
      }
    }
    Model(merges.result())
  }
}
