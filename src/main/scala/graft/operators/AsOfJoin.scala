package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of style "best match at time T" join, generalizing the reference's
  * best-shipping-address-at-order-time pick (reference
  * models/marts/commerce/facts/fct_orders.sql:115-141): equi-join on an
  * entity key, then rank candidates by (candidate_ts <= anchor_ts first,
  * then smallest |Δt|), keep rank 1.
  *
  * Scale: composed of an equi-join (hash-partitioned on the entity key —
  * broadcast when the candidate side is small) and a window over the left
  * key. Candidate fan-out is bounded by candidates-per-entity, not by table
  * size; for genuinely huge candidate sides, pre-reduce candidates with a
  * coarse time-bucket filter before ranking.
  */
object AsOfJoin {

  /** Left row + best matching right row (nulls if none).
    *
    * @param leftTs  anchor timestamp on the left
    * @param rightTs candidate timestamp on the right
    * @param leftPk  unique left key to rank within
    * @param tiebreak deterministic final tiebreak from the right side
    */
  def bestAtTime(
      left: DataFrame,
      right: DataFrame,
      joinKeys: Seq[String],
      leftPk: Column,
      leftTs: Column,
      rightTs: Column,
      tiebreak: Column): DataFrame = {
    val joined = left.join(right, joinKeys, "left")
    // Prefer candidates at-or-before the anchor (case ts<=anchor then 0
    // else 1), then minimal absolute distance — exact reference ordering
    // (fct_orders.sql:131-136), micros for exactness.
    val pref    = when(rightTs <= leftTs, 0).otherwise(1)
    val absDiff = abs(unix_micros(rightTs) - unix_micros(leftTs))
    val w = Window.partitionBy(leftPk).orderBy(pref.asc, absDiff.asc, tiebreak.asc)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
