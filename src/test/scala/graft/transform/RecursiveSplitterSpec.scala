package graft.transform

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class RecursiveSplitterSpec extends AnyFunSuite {

  test("short text is a single chunk") {
    assert(RecursiveSplitter.split("hello world") == Seq("hello world"))
  }

  test("empty text yields no chunks") {
    assert(RecursiveSplitter.split("") == Seq.empty)
    assert(RecursiveSplitter.split("   ") == Seq.empty)
  }

  test("splits on paragraph boundary first") {
    val a = "a" * 300
    val b = "b" * 300
    val chunks = RecursiveSplitter.split(s"$a\n\n$b")
    assert(chunks == Seq(a, b))
  }

  test("falls through separator hierarchy: paragraphs, lines, sentences, words") {
    val sentence = ("word " * 90).trim // 449 chars, splits only on spaces
    val chunks = RecursiveSplitter.split(sentence + " " + sentence)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 500))
  }

  test("overlap carries tail of previous chunk") {
    // pieces of 100 chars separated by '.', chunk 500/50
    val pieces = (0 until 12).map(i => s"$i" * 100)
    val text = pieces.mkString(".")
    val chunks = RecursiveSplitter.split(text)
    assert(chunks.length > 1)
    // each adjacent pair shares content: last piece of chunk n reappears
    // in chunk n+1 only when it fits within the 50-char overlap; with
    // 100-char pieces no overlap is possible, so chunks partition cleanly
    assert(chunks.forall(_.length <= 500))
  }

  test("overlap is actually emitted with small pieces") {
    val text = (1 to 50).map(i => f"w$i%03d").mkString(" ")
    val chunks = RecursiveSplitter.split(text, chunkSize = 60, chunkOverlap = 20)
    assert(chunks.length > 1)
    // the 20-char overlap carries the trailing pieces of chunk n into
    // chunk n+1, so the previous tail word reappears somewhere in front
    chunks.sliding(2).foreach {
      case Seq(p, n) =>
        val tail = p.split(" ").last
        assert(n.contains(tail), s"'$n' lost overlap word '$tail'")
      case _ =>
    }
  }

  test("oversized unsplittable piece is emitted as-is (separator fallback)") {
    val blob = "x" * 700 // no separator at all
    val chunks = RecursiveSplitter.split(blob)
    assert(chunks == Seq(blob))
  }

  test("golden: paragraph/line/sentence hierarchy with overlap (200/30)") {
    val t = ("Para one has several words here.\n\nPara two follows.\n" +
      "Line two of para two. More sentence text to push the length up a bit.") * 3
    val chunks = RecursiveSplitter.split(t, 200, 30)
    assert(chunks == Seq(
      "Para one has several words here.\n\nPara two follows.\nLine two of para two." +
        " More sentence text to push the length up a bit.Para one has several words here.",
      "Para two follows.\nLine two of para two. More sentence text to push the length" +
        " up a bit.Para one has several words here.",
      "Para two follows.\nLine two of para two. More sentence text to push the length" +
        " up a bit."))
  }

  test("golden: sentence separator keeps the dot attached to the next piece (20/5)") {
    val chunks = RecursiveSplitter.split(
      "aaaa. bbbb. cccc. dddd. eeee. ffff. gggg. hhhh", 20, 5)
    assert(chunks == Seq("aaaa. bbbb. cccc", ". dddd. eeee. ffff", ". gggg. hhhh"))
  }

  test("property: every chunk within size, nonempty, trimmed (200 random texts)") {
    val rnd = new Random(42)
    val seps = Seq(" ", ".", "\n", "\n\n")
    for (_ <- 0 until 200) {
      val n = rnd.nextInt(300)
      val sep = seps(rnd.nextInt(seps.length))
      val text = Seq.fill(n)(Seq.fill(3)(('a' + rnd.nextInt(26)).toChar).mkString)
        .mkString(sep)
      val chunks = RecursiveSplitter.split(text)
      assert(chunks.forall(c => c.length <= 500), s"oversize chunk for sep='$sep' n=$n")
      assert(chunks.forall(_.nonEmpty))
      assert(chunks.forall(c => c == c.trim))
    }
  }

  test("property: chunks preserve all content in order with zero overlap (200 random texts)") {
    val rnd = new Random(7)
    for (_ <- 0 until 200) {
      val n = 1 + rnd.nextInt(120)
      val text = Seq.fill(n)(Seq.fill(4)(('a' + rnd.nextInt(26)).toChar).mkString)
        .mkString(" ")
      val chunks = RecursiveSplitter.split(text, chunkSize = 50, chunkOverlap = 0)
      val joined = chunks.mkString(" ").split("\\s+").mkString(" ")
      val orig = text.trim.split("\\s+").mkString(" ")
      assert(joined == orig)
    }
  }
}
