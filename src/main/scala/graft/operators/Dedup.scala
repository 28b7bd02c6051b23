package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * `keepLatest` is the reference's dominant pattern (9 sites):
  * `row_number() over (partition by <pk> order by <recency> desc) = 1`
  * (reference models/staging/stg_orders.sql:90-97,
  * stg_customers.sql:78-85, stg_order_items.sql:42-49 …). Snowflake QUALIFY
  * has no Spark form; window + filter is the idiomatic equivalent and plans
  * to a single shuffle on the partition keys.
  *
  * Scale: one hash exchange on `keys`, then a per-partition sort — no
  * global sort, no driver collection. With AQE on, skewed partition keys
  * are split at runtime. For 100 TB, pre-bucketing the landing table by the
  * dedup key removes the exchange entirely.
  */
object Dedup {

  /** Keep exactly one row per key, ordered by `ordering` (put `.desc` /
    * tiebreakers in the caller). Deterministic iff ordering is total. */
  def keepFirst(df: DataFrame, keys: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Dedup keep-latest by recency desc with a deterministic tiebreak. */
  def keepLatest(df: DataFrame, keys: Seq[Column], recency: Column, tiebreak: Column): DataFrame =
    keepFirst(df, keys, Seq(recency.desc_nulls_last, tiebreak.desc))

  /** Duplicate-key detection: `group by keys having count(*) > 1`
    * (reference tests/stg_product_brands__unique_brand_id.sql:1-7). */
  def duplicateKeys(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(count(lit(1)).as("dup_count")).filter(col("dup_count") > 1)
}
