package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Title extraction + hierarchical sectionizer.
  *
  * Semantics derived from the reference
  * (`/root/reference/micro-infobot/app.py:73-107`): a *title* is a line that,
  * after stripping, matches `^[A-Z\s]+$` and is longer than 5 chars; walking
  * the `\n\n`-separated paragraphs in order, a paragraph that is a title
  * becomes the active section (initially `"General"`) and is consumed; every
  * other paragraph is emitted tagged with the active section.
  *
  * Spark has no implicit row order, so paragraph position is materialized
  * with `posexplode` and the "latest preceding title" is a running
  * `last(..., ignoreNulls)` window over `(doc_id, pos)` — the one genuinely
  * order-sensitive operator in the pipeline. The window shuffles once on
  * `doc_id`; at 100 TB the partition key is the document, which is bounded
  * (a doc's paragraphs always fit one partition), so this scales linearly.
  */
object Sectionizer {

  val DefaultSection = "General"

  /** Title predicate on an already-trimmed single line (app.py:82). */
  def isTitleLine(c: Column): Column =
    c.rlike("^[A-Z\\s]+$") && length(c) > 5 && !c.contains("\n")

  /** doc(doc_id, text) -> (doc_id, title) — one row per title line. */
  def titles(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val line = trim(col("line"))
    docs
      .select(col("doc_id"), explode(split(col(textCol), "\n")).as("line"))
      .where(isTitleLine(line))
      .select(col("doc_id"), line.as("title"))
  }

  /** doc(doc_id, text) -> (doc_id, pos, section, paragraph).
    *
    * `pos` is the 0-based paragraph index in the original text (titles keep
    * their slot in the numbering but are consumed, matching the reference's
    * emit-order observably). Empty paragraphs are kept, as the reference
    * appends them too (app.py:97-105).
    */
  def sectionize(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val para = trim(col("raw"))
    val isTitle = isTitleLine(para)
    val w = Window
      .partitionBy("doc_id")
      .orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), posexplode(split(col(textCol), "\n\n")).as(Seq("pos", "raw")))
      .withColumn("is_title", isTitle)
      .withColumn(
        "section",
        coalesce(
          last(when(col("is_title"), para), ignoreNulls = true).over(w),
          lit(DefaultSection)))
      .where(!col("is_title"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("section"), para.as("paragraph"))
  }
}
