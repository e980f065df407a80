package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level data-quality expectations: declare named boolean constraints,
  * get one row per constraint with pass/violation counts — the
  * contract-check stage of an intake pipeline. One pass over the data
  * (all constraints evaluated in a single aggregate projection, no
  * per-constraint scans).
  */
object Expectations {

  case class Expectation(name: String, predicate: Column)

  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    val aggs = expectations.flatMap { e =>
      Seq(
        count(when(e.predicate, 1)).as(s"__pass_${e.name}"),
        count(when(!coalesce(e.predicate, lit(false)), 1)).as(s"__fail_${e.name}"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = expectations.map { e =>
      struct(
        lit(e.name).as("expectation"),
        col(s"__pass_${e.name}").as("n_pass"),
        col(s"__fail_${e.name}").as("n_violations"))
    }
    wide
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.expectation"), col("r.n_pass"), col("r.n_violations"))
      .orderBy("expectation")
  }

  /** Quarantine split: (passing rows, violating rows) for one predicate. */
  def quarantine(df: DataFrame, predicate: Column): (DataFrame, DataFrame) =
    (df.where(coalesce(predicate, lit(false))),
      df.where(!coalesce(predicate, lit(false))))
}
