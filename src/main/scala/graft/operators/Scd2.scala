package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — dbt's `snapshot` materialization
  * (timestamp + check strategy combined: a new version opens only when the
  * payload actually changed AND the batch is newer). The reference project
  * ships the snapshots/ directory (empty — dbt's standard layout); this is
  * the operator a dbt user expects behind it.
  *
  * Row states after a merge:
  *  - history rows (valid_to set) pass through untouched
  *  - current rows whose key is absent from the batch, or whose payload is
  *    unchanged, stay current
  *  - current rows with a CHANGED payload close (valid_to = batch
  *    updated_at) and a new current version opens (valid_from = updated_at)
  *  - brand-new keys open their first version
  *
  * Scale: one shuffle on the key — the join and both anti-joins all key on
  * the same column, so the exchange is planned once and reused; history
  * never rewrites (at 100 TB the output appends closed+new versions to a
  * key-partitioned snapshot table).
  */
object Scd2 {

  /** `existing`: (key, payloadCols..., validFrom, validTo) — validTo null
    * marks the current version. `fresh`: (key, payloadCols...,
    * updatedAtCol) and must be KEY-UNIQUE — dbt snapshots reject batches
    * with duplicate keys; here duplicates close the superseded version
    * once (max updated_at) but would insert one version per duplicate
    * row, so pre-aggregate CDC batches to latest-per-key first.
    * Returns the full post-merge version history. */
  def merge(existing: DataFrame, fresh: DataFrame, key: String,
      payloadCols: Seq[String], updatedAtCol: String,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must name at least one column")
    val history = existing.filter(col(validToCol).isNotNull)
    val current = existing.filter(col(validToCol).isNull)

    val joined = current.alias("cur").join(fresh.alias("b"),
      col(s"cur.$key") === col(s"b.$key"))
    // null-safe payload inequality (dbt check strategy) + newer-batch guard
    val differs = payloadCols.map(c => !(col(s"cur.$c") <=> col(s"b.$c")))
      .reduce(_ || _)
    // one row per key (EXISTS semantics): a duplicate-key batch must not
    // multiply the closed rows through the joins below
    val changedKeys = joined
      .where(differs && col(s"b.$updatedAtCol") > col(s"cur.$validFromCol"))
      .select(col(s"cur.$key").as(key), col(s"b.$updatedAtCol").as("__close_at"))
      .groupBy(col(key)).agg(max(col("__close_at")).as("__close_at"))

    // close superseded versions; unchanged/absent keys stay current
    val closed = current.join(changedKeys, Seq(key))
      .withColumn(validToCol, col("__close_at")).drop("__close_at")
    val stillCurrent = current.join(changedKeys.select(key), Seq(key), "left_anti")
    // new versions for changed keys + first versions for brand-new keys
    val inserts = fresh.join(changedKeys.select(key), Seq(key))
      .unionByName(fresh.join(current.select(key), Seq(key), "left_anti"))
      .withColumn(validFromCol, col(updatedAtCol))
      .withColumn(validToCol,
        lit(null).cast(existing.schema(validToCol).dataType))
      .drop(updatedAtCol)

    history.unionByName(stillCurrent).unionByName(closed).unionByName(inserts)
  }

  /** The partition column of the on-disk snapshot layout: rows live in the
    * month they CLOSED ('yyyy-MM' of valid_to), current rows in the
    * `CurrentPartition` sentinel. Closed-month partitions are immutable
    * after their month passes — which is what makes the snapshot APPEND at
    * scale instead of rewrite. */
  val PartitionCol = "valid_to_month"
  val CurrentPartition = "9999-12"

  private def withPartition(df: DataFrame, validToCol: String): DataFrame =
    df.withColumn(PartitionCol,
      coalesce(date_format(col(validToCol), "yyyy-MM"), lit(CurrentPartition)))

  /** [[merge]] composed onto a partitioned parquet snapshot — the 100 TB
    * shape the merge's scaladoc prescribes. Per batch this touches ONLY:
    *  - the current partition (read + rewritten — it holds the open
    *    versions the merge must examine), and
    *  - the close-month partitions named by the batch's updated_at values
    *    (read as passthrough + rewritten with this batch's closes
    *    appended — normally just the current calendar month).
    * Every other closed-month partition — the unbounded bulk of a
    * 100 TB snapshot — is never read, listed or rewritten (dynamic
    * partition overwrite; the spec pins untouched-partition mtimes).
    * The merged slice stages to `stagePath` first (Spark cannot overwrite
    * files a job still reads); the staging slice is touched-partitions-
    * sized, never table-sized. `fresh` must be key-unique (see [[merge]]). */
  def mergeIntoPartitionedSnapshot(spark: SparkSession, targetPath: String,
      fresh: DataFrame, key: String, payloadCols: Seq[String],
      updatedAtCol: String, stagePath: String,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to",
      maxTouched: Int = IncrementalMerge.MaxTouchedPartitions): Unit = {
    val tp = new org.apache.hadoop.fs.Path(targetPath)
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tp)) {
      // first batch: everything opens its first version
      val init = fresh
        .withColumn(validFromCol, col(updatedAtCol))
        .withColumn(validToCol,
          lit(null).cast(fresh.schema(updatedAtCol).dataType))
        .drop(updatedAtCol)
      withPartition(init, validToCol)
        .write.partitionBy(PartitionCol).parquet(targetPath)
      return
    }
    // bounded: the distinct close months a batch can touch = the months of
    // its own updated_at values (a CDC batch spans one or two months).
    // Same explicit cap contract as IncrementalMerge.MaxTouchedPartitions:
    // the limit bounds the driver fetch, the check fails loudly.
    val touchedMonths = fresh
      .select(date_format(col(updatedAtCol), "yyyy-MM").as("m"))
      .distinct().limit(maxTouched + 1)
      .collect().map(_.getString(0)).filter(_ != null)
    if (touchedMonths.length > maxTouched)
      throw new IllegalStateException(
        s"mergeIntoPartitionedSnapshot: batch spans > $maxTouched " +
          "distinct close months — not an incremental CDC batch; run a " +
          "full snapshot rebuild")
    val snap = spark.read.parquet(targetPath)
      .withColumn(PartitionCol, col(PartitionCol).cast("string"))
    val current = snap.where(col(PartitionCol) === CurrentPartition)
      .drop(PartitionCol)
    val closedTouched = snap
      .where(col(PartitionCol).isin(touchedMonths: _*)).drop(PartitionCol)
    val merged = merge(current, fresh, key, payloadCols, updatedAtCol,
      validFromCol, validToCol)
    withPartition(merged.unionByName(closedTouched), validToCol)
      .write.mode("overwrite").parquet(stagePath)
    spark.read.parquet(stagePath)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(PartitionCol)
      .parquet(targetPath)
    fs.delete(new org.apache.hadoop.fs.Path(stagePath), true)
    ()
  }
}
