package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Hard cap on the distinct partition keys one incremental batch may
    * touch. The partition-pruned merge collects the touched-key list to
    * the driver (to prune the target read and scope the dynamic
    * overwrite) — sound ONLY while that list is batch-cadence-sized
    * (days/months per batch, documented at each call site). A batch
    * touching more than this is a full-table rewrite in disguise and
    * fails fast rather than melting the driver at 100 TB. */
  val MaxTouchedPartitions: Int = 10000

  def merge(existing: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(fresh, keys, "left_anti").unionByName(fresh)

  /** Apply a CDC batch with insert/update/delete ops (Debezium-style op
    * column, 'D' = tombstone): the latest op per key wins (total order =
    * `orderCols`, so callers must pass enough columns to break ties),
    * upserts replace the key's row, tombstones remove the key. Delete of
    * an absent key is a no-op, matching MERGE semantics. One shuffle on
    * the key: the in-batch latest-wins window, the anti-join, and the
    * union all key on it (exchange reuse). At 100 TB this composes with
    * `mergeIntoPartitionedTarget` the same way plain upserts do — the
    * CDC batch is the `fresh` side, tombstoned keys simply vanish from
    * their (touched, rewritten) partitions. */
  def applyCdc(existing: DataFrame, cdc: DataFrame, keys: Seq[String],
      opCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    val latest = cdc
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("_rn") === 1)
    val payload = existing.columns // target schema: op/order cols dropped
    val upserts = latest.where(col(opCol) =!= "D")
      .select(payload.map(col): _*)
    existing.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(upserts)
  }

  /** Merge where fresh rows are bounded by a recency predicate (the dbt
    * `is_incremental()` lookback branch). */
  def mergeWithLookback(
      existing: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      lookbackPredicate: Column): DataFrame =
    merge(existing, source.filter(lookbackPredicate), keys)

  /** The on-disk 100 TB shape this operator's scaladoc prescribes: merge
    * `fresh` into a `partitionCol`-partitioned parquet target touching
    * ONLY the partitions present in `fresh` — partition-pruned read,
    * anti-join+union merge, dynamic partition overwrite. Untouched
    * partitions are never read or rewritten. The merged slice stages to
    * `stagePath` first (Spark cannot overwrite files a job still reads);
    * the staging dir is touched-partitions-sized and deleted after the
    * overwrite commits.
    *
    * Contract: `partitionCol` must be non-null on every row, and a key's
    * partition value must be STABLE across batches (the usual incremental
    * contract where the partition derives from the key's creation date) —
    * a late row that MOVES a key to a new partition leaves the stale row
    * in the old, untouched partition behind (the same semantics as Hive
    * dynamic partition overwrite); rows that genuinely migrate partitions
    * need a full-table merge instead. Used by both the batch path and the
    * streaming foreachBatch sink. */
  def mergeIntoPartitionedTarget(spark: SparkSession, targetPath: String,
      fresh: DataFrame, keys: Seq[String], partitionCol: String,
      stagePath: String,
      maxTouched: Int = MaxTouchedPartitions): Unit = {
    val b = fresh.persist()
    try {
      // bounded: dates per batch. The bound is a CONTRACT, not a hope —
      // limit(cap+1) keeps the driver fetch itself capped, and exceeding
      // the cap fails loudly instead of silently hauling a partition list
      // (and then a read + dynamic overwrite) of unbounded size through
      // the driver.
      val touched = b.select(col(partitionCol)).distinct()
        .limit(maxTouched + 1)
        .collect().map(_.get(0)).filter(_ != null)
      if (touched.length > maxTouched)
        throw new IllegalStateException(
          s"mergeIntoPartitionedTarget: batch touches > $maxTouched " +
            s"distinct '$partitionCol' partitions — that is a full-table " +
            "rewrite wearing incremental clothes; repartition the batch " +
            "cadence or run a full merge")
      if (touched.nonEmpty) {
        // explicit existence probe, NOT a catch-all: swallowing a transient
        // read failure (corrupt footer, FS hiccup) as "empty target" would
        // silently overwrite touched partitions with fresh-only rows
        val tp = new org.apache.hadoop.fs.Path(targetPath)
        val targetExists =
          tp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tp)
        val existingSlice =
          if (targetExists) spark.read.parquet(targetPath)
            // partition-inferred col (e.g. DATE from dirname) cast back to
            // the fresh side's type so the key anti-join lines up
            .withColumn(partitionCol,
              col(partitionCol).cast(b.schema(partitionCol).dataType))
            .where(col(partitionCol).isin(touched: _*))
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], b.schema)
        merge(existingSlice, b, keys)
          .write.mode("overwrite").parquet(stagePath)
        spark.read.parquet(stagePath)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCol)
          .parquet(targetPath)
        val p = new org.apache.hadoop.fs.Path(stagePath)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        ()
      }
    } finally { b.unpersist(); () }
  }
}
