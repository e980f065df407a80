package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological even
  * for AQE (one key holding >> a partition's worth of rows on the big
  * side). Classic salting: the skewed (big) side gets a random salt in
  * [0, saltFactor); the small side is exploded `saltFactor`× so every
  * salted key still finds its match. The join key becomes (key, salt), so
  * the hot key's rows spread over `saltFactor` reducers.
  *
  * Cost: small side replicated `saltFactor`× — use only on keys AQE's
  * skew-join split cannot tame (it splits partitions, not single keys on
  * the build side of a broadcast-ineligible join). Salt derives from a
  * deterministic hash of the big side's row content when `deterministic`,
  * so re-runs produce identical partitioning (reproducible pipelines).
  */
object Skew {

  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi",
      "leftanti", "left_anti")

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner",
      deterministic: Boolean = true): DataFrame = {
    // right/full outer would emit every unmatched small-side row once per
    // salt copy — refuse rather than silently duplicate
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti joins, not '$joinType' " +
        "(outer small-side rows would be duplicated per salt)")
    val saltCol =
      if (deterministic)
        pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor)).cast("int")
      else (rand(42) * saltFactor).cast("int")
    val bigSalted = big.withColumn("__salt", saltCol)
    val smallSalted = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted
      .join(smallSalted, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
