package graft.serve

import graft.SparkSpec

class GenEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(cases: Seq[(Long, String, String)], n: Int) =
    GenEval.rougeN(cases.toDF("pair_id", "candidate", "reference"), n)
      .orderBy("pair_id")
      .select("pair_id", "cand_grams", "ref_grams", "overlap",
        "precision", "recall", "f1")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSeq

  test("rouge-1: hand-computed precision/recall/f1") {
    // cand: [the cat sat] (3), ref: [the cat sat on the mat] (6)
    // overlap: the(min 1,2)=1 cat=1 sat=1 -> 3; P=1, R=0.5, F1=2*3/9
    val Seq((_, c, r, ov, p, rec, f1)) =
      run(Seq((1L, "The cat sat", "the cat sat on the mat")), 1)
    assert((c, r, ov) == ((3L, 6L, 3L)))
    assert(p == 1.0 && rec == 0.5)
    assert(math.abs(f1 - 2.0 * 3 / 9) < 1e-6) // f1 rounds to 6 decimals
  }

  test("clipped counts: repeating a reference gram earns it once per ref occurrence") {
    // cand: [the the the the] ref: [the cat the] -> 'the': min(4, 2) = 2
    val Seq((_, c, r, ov, p, rec, _)) =
      run(Seq((1L, "the the the the", "the cat the")), 1)
    assert((c, r, ov) == ((4L, 3L, 2L)))
    assert(p == 0.5 && math.abs(rec - 2.0 / 3) < 1e-6)
  }

  test("rouge-2: sliding bigrams, word order matters") {
    // cand "a b c" grams: [a b, b c]; ref "c b a" grams: [c b, b a] -> 0
    val Seq((_, c, r, ov, _, _, f1)) = run(Seq((1L, "a b c", "c b a")), 2)
    assert((c, r, ov) == ((2L, 2L, 0L)) && f1 == 0.0)
    // identical order -> perfect
    val Seq((_, _, _, ov2, p2, r2, f12)) = run(Seq((2L, "a b c", "a b c")), 2)
    assert(ov2 == 2L && p2 == 1.0 && r2 == 1.0 && f12 == 1.0)
  }

  test("short sides score zero rows, never vanish or divide by zero") {
    val got = run(Seq(
      (1L, "", "the reference text"),   // empty candidate
      (2L, "only", ""),                 // empty reference
      (3L, "a", "b")                    // both too short for n=2
    ), 2)
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.forall { case (_, _, _, ov, p, r, f1) =>
      ov == 0L && p == 0.0 && r == 0.0 && f1 == 0.0 })
    // n=1 over case 1: candidate empty, reference has grams -> recall 0
    val Seq((_, c1, r1, _, _, _, _)) = run(Seq((1L, "", "the ref")), 1)
    assert(c1 == 0L && r1 == 2L)
  }

  test("pairs are independent; tokenization is the BM25 law (case/punct-insensitive)") {
    val got = run(Seq(
      (1L, "Hello, WORLD!", "hello world"),
      (2L, "unrelated words here", "hello world")), 1)
    assert(got.head._5 == 1.0 && got.head._6 == 1.0 && got.head._7 == 1.0)
    assert(got(1)._4 == 0L)
  }

  test("duplicate pair ids refuse loudly instead of silently blending") {
    // two rows under one id would merge gram multisets and emit a single
    // plausible-but-wrong row (ADVICE r12)
    val e = intercept[IllegalArgumentException] {
      GenEval.rougeN(Seq(
        (1L, "hello world", "hello world"),
        (1L, "goodbye moon", "goodbye moon")).toDF("pair_id", "candidate", "reference"), 1)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("refuses an out-of-range n") {
    intercept[IllegalArgumentException] {
      GenEval.rougeN(Seq((1L, "a", "b")).toDF("pair_id", "candidate", "reference"), 0)
    }
    intercept[IllegalArgumentException] {
      GenEval.rougeN(Seq((1L, "a", "b")).toDF("pair_id", "candidate", "reference"), 9)
    }
  }
}
