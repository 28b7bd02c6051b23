package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Incremental upsert-by-key without Delta: keep existing rows whose key is
  * absent from the fresh batch, then append the fresh batch — exactly dbt's
  * `materialized='incremental', unique_key=…` merge with an N-day lookback
  * (reference models/marts/commerce/facts/fct_orders.sql:1-5,23-25,213-215,
  * fct_order_items.sql:1-5,40-42,166-168; SURVEY §4.3#1).
  *
  * Scale: the anti-join shuffles on the merge key; fresh is a 7-day slice
  * so it broadcasts in practice (AQE converts to broadcast-hash under the
  * threshold). On disk, partitioning the target by date means only lookback
  * partitions rewrite (dynamic partition overwrite), not the whole table.
  */
object IncrementalMerge {

  def merge(existing: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(fresh, keys, "left_anti").unionByName(fresh)

  /** Merge where fresh rows are bounded by a recency predicate (the dbt
    * `is_incremental()` lookback branch). */
  def mergeWithLookback(
      existing: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      lookbackPredicate: Column): DataFrame =
    merge(existing, source.filter(lookbackPredicate), keys)
}
