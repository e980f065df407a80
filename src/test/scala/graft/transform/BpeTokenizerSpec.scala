package graft.transform

import org.scalatest.funsuite.AnyFunSuite

class BpeTokenizerSpec extends AnyFunSuite {

  // the Sennrich et al. 2016 worked example: {low:5, lower:2, newest:6,
  // widest:3} — pair counts make (e,s) and (s,t) tie at 9; the
  // lexicographic tie-break picks (e,s), and ("es","t") follows at 9
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("training follows exact pair counts with lexicographic tie-break") {
    val m = BpeTokenizer.train(sennrich, numMerges = 4)
    assert(m.merges.take(2) == Vector(("e", "s"), ("es", "t")),
      s"merges=${m.merges}")
    // every learned merge had corpus frequency >= 2
    assert(m.merges.length == 4)
  }

  test("frequent words collapse to single tokens; encode is roundtrip-exact") {
    val m = BpeTokenizer.train(sennrich, numMerges = 50)
    // with enough merges every training word becomes one token
    Seq("low", "lower", "newest", "widest").foreach { w =>
      assert(m.encodeWord(w).mkString == w, s"roundtrip broke for $w")
      assert(m.encodeWord(w).length == 1, s"$w -> ${m.encodeWord(w)}")
    }
    // unseen word: decomposes into learned subwords + chars, still exact
    assert(m.encodeWord("lowest").mkString == "lowest")
    assert(m.encodeWord("lowest").length < "lowest".length,
      "shared subwords (low/est) must compress an unseen word")
  }

  test("minFrequency stops before hapax merges") {
    val m = BpeTokenizer.train(Seq(("ab", 1L), ("cd", 1L)), numMerges = 10)
    assert(m.merges.isEmpty, "pairs of frequency 1 must not be merged")
    val m2 = BpeTokenizer.train(
      Seq(("ab", 1L), ("cd", 1L)), numMerges = 10, minFrequency = 1L)
    assert(m2.merges.nonEmpty)
  }

  test("free-text encode pretokenizes on whitespace, lowercases, roundtrips") {
    val m = BpeTokenizer.train(sennrich, numMerges = 10)
    val toks = m.encode("  Newest LOWER\tlow \n")
    assert(toks.mkString == "newestlowerlow")
    assert(m.encode("") == Vector.empty && m.encode("   ") == Vector.empty)
  }

  test("property: roundtrip + determinism over random corpora") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdef"
    val words = (0 until 60).map { _ =>
      val w = (0 until 1 + rnd.nextInt(8))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (w, 1L + rnd.nextInt(20).toLong)
    }
    val m1 = BpeTokenizer.train(words, numMerges = 40)
    val m2 = BpeTokenizer.train(words, numMerges = 40)
    assert(m1.merges == m2.merges, "training must be deterministic")
    words.foreach { case (w, _) =>
      assert(m1.encodeWord(w).mkString == w, s"roundtrip broke for $w")
      assert(m1.encodeWord(w).forall(_.nonEmpty))
    }
  }
}
