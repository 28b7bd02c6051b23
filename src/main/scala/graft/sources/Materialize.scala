package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Materialization policies — the reference's sink surface
  * (reference dbt_project.yml:16-39: view / table / incremental /
  * ephemeral-like caching) plus the custom schema-name resolution
  * (reference macros/generate_schema_name.sql:1-10: a declared custom
  * schema is used VERBATIM, not prefixed).
  *
  * On a cluster the `table` policy writes partitioned parquet (callers
  * pass partition columns for date-partitioned marts); `view` registers
  * a session view (no data movement); `cache` pins a hot frame
  * MEMORY_AND_DISK for DAG nodes with multiple consumers (see
  * graft.plans.Pipeline); incremental-merge lives in
  * operators.IncrementalMerge.
  */
object Materialize {

  sealed trait Policy
  case object AsView extends Policy
  case object AsTable extends Policy
  case object AsCache extends Policy

  /** (schema, table) → session-catalog view name. Mirrors the reference
    * macro: custom schema verbatim, joined with a double underscore
    * (temp views have no namespaces). */
  def resolveName(schema: String, table: String): String =
    s"${schema.toLowerCase}__${table.toLowerCase}"

  /** View sink: register under the resolved (schema, table) name. */
  def view(df: DataFrame, schema: String, table: String): String = {
    val name = resolveName(schema, table)
    df.createOrReplaceTempView(name)
    name
  }

  /** Table sink: parquet under outDir/<schema>/<table>, optionally
    * partitioned (the 100 TB path: partition by date, let readers prune). */
  def table(df: DataFrame, outDir: String, schema: String, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$outDir/$schema/$table")
  }

  /** Bucketed table sink: hash-bucket (and sort) by the join/agg key so
    * co-located reads need NO exchange — the pre-shuffled layout the
    * big-big joins in SCALE.md rely on at 100 TB. Bucketing requires the
    * session catalog (`saveAsTable`); `path` makes it an external table
    * so data lands under the caller's directory, not the warehouse.
    * Readers via `spark.table(name)` get the bucket spec; a join of two
    * tables bucketed the same way on the same key plans as a sort-merge
    * join with zero Exchange on either side (pinned by BucketingSpec). */
  def bucketedTable(df: DataFrame, path: String, name: String,
      bucketCol: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)

  /** Transient/cache sink: pin + register (spill-safe storage level). */
  def cache(df: DataFrame, schema: String, table: String): DataFrame = {
    val pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
    pinned.createOrReplaceTempView(resolveName(schema, table))
    pinned
  }

  def apply(policy: Policy, df: DataFrame, spark: SparkSession,
      outDir: String, schema: String, table: String): Unit = policy match {
    case AsView  => view(df, schema, table)
    case AsTable => Materialize.table(df, outDir, schema, table)
    case AsCache => cache(df, schema, table)
  }
}
