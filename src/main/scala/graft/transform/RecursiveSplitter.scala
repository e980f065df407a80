package graft.transform

import scala.collection.mutable.ArrayBuffer

/** Recursive character text splitter.
  *
  * Re-implements the recursive-split semantics the reference configures at
  * `/root/reference/micro-infobot/app.py:116-120` (chunk_size=500,
  * chunk_overlap=50, separators `["\n\n","\n","."," "]`): pick the coarsest
  * separator present in the text, split keeping the separator attached to the
  * start of the following piece, greedily merge pieces into windows of at most
  * `chunkSize` chars with `chunkOverlap` chars carried between adjacent
  * chunks, and recurse with finer separators into any piece that is still too
  * large. Whitespace is stripped from the emitted chunks and empty chunks are
  * dropped.
  *
  * This is a pure Scala function (no Spark deps) so unit/property tests can
  * pin the exact boundary semantics; [[graft.transform.Chunker]] wraps it as a
  * UDF for distributed use.
  */
object RecursiveSplitter {

  val DefaultChunkSize = 500
  val DefaultChunkOverlap = 50
  val DefaultSeparators: List[String] = List("\n\n", "\n", ".", " ")

  def split(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      chunkOverlap: Int = DefaultChunkOverlap,
      separators: List[String] = DefaultSeparators): Seq[String] =
    splitRec(text, separators, chunkSize, chunkOverlap)

  private def splitRec(
      text: String,
      separators: List[String],
      chunkSize: Int,
      chunkOverlap: Int): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    // Coarsest separator that occurs in the text; the last one is the
    // fallback even when absent. Finer separators remain for recursion.
    var separator = separators.lastOption.getOrElse("")
    var remaining: List[String] = Nil
    var i = 0
    var found = false
    val seps = separators
    while (i < seps.length && !found) {
      val s = seps(i)
      if (s.isEmpty || text.contains(s)) {
        separator = s
        remaining = seps.drop(i + 1)
        found = true
      }
      i += 1
    }

    val splits = splitKeepingSeparator(text, separator)
    // Separator stays attached to the pieces, so merging joins with "".
    val good = ArrayBuffer.empty[String]
    for (piece <- splits) {
      if (piece.length < chunkSize) {
        good += piece
      } else {
        if (good.nonEmpty) {
          out ++= mergeSplits(good.toSeq, chunkSize, chunkOverlap)
          good.clear()
        }
        if (remaining.isEmpty) out += piece
        else out ++= splitRec(piece, remaining, chunkSize, chunkOverlap)
      }
    }
    if (good.nonEmpty) out ++= mergeSplits(good.toSeq, chunkSize, chunkOverlap)
    out.toSeq
  }

  /** Split on `separator`, attaching each separator occurrence to the start
    * of the piece that follows it; empty pieces are dropped. An empty
    * separator splits into single characters.
    */
  private[transform] def splitKeepingSeparator(
      text: String, separator: String): Seq[String] = {
    if (separator.isEmpty) return text.map(_.toString)
    val pieces = ArrayBuffer.empty[String]
    var start = 0
    var idx = text.indexOf(separator)
    var first = true
    while (idx >= 0) {
      val head = if (first) text.substring(start, idx)
        else separator + text.substring(start, idx)
      pieces += head
      first = false
      start = idx + separator.length
      idx = text.indexOf(separator, start)
    }
    pieces += (if (first) text.substring(start) else separator + text.substring(start))
    pieces.filter(_.nonEmpty).toSeq
  }

  /** Greedy windowed merge: accumulate pieces until adding one would exceed
    * `chunkSize`, emit, then drop leading pieces until the carried tail is
    * within `chunkOverlap` (and adding the next piece fits).
    */
  private[transform] def mergeSplits(
      splits: Seq[String], chunkSize: Int, chunkOverlap: Int): Seq[String] = {
    val docs = ArrayBuffer.empty[String]
    var current = Vector.empty[String]
    var total = 0
    for (piece <- splits) {
      val len = piece.length
      if (total + len > chunkSize && current.nonEmpty) {
        joinStrip(current).foreach(docs += _)
        while (total > chunkOverlap ||
            (total + len > chunkSize && total > 0)) {
          total -= current.head.length
          current = current.tail
        }
      }
      current = current :+ piece
      total += len
    }
    joinStrip(current).foreach(docs += _)
    docs.toSeq
  }

  private def joinStrip(pieces: Seq[String]): Option[String] = {
    val joined = pieces.mkString("").trim
    if (joined.isEmpty) None else Some(joined)
  }
}
