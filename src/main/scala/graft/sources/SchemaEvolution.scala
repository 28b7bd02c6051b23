package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Schema-evolution policies for incremental sinks — the reference's
  * `on_schema_change` contract (reference dbt_project.yml +
  * stg_invoice_payments.sql:4 `append_new_columns`,
  * dim_customer.sql:6 `sync_all_columns`).
  *
  * `appendNewColumns`: the target grows columns that only the incoming
  * batch has (old rows null-filled); columns the batch dropped survive
  * (null-filled on new rows). `syncAllColumns`: the target becomes
  * exactly the incoming schema (dropped columns disappear).
  * Both return (alignedExisting, alignedIncoming) with identical
  * schemas, ready for IncrementalMerge. Pure projections — no data
  * movement beyond the merge itself.
  */
object SchemaEvolution {

  private def alignTo(df: DataFrame, names: Seq[String],
      types: Map[String, org.apache.spark.sql.types.DataType]): DataFrame =
    df.select(names.map { n =>
      if (df.columns.contains(n)) col(n).cast(types(n)).as(n)
      else lit(null).cast(types(n)).as(n)
    }: _*)

  /** Union schema: existing columns first (their types win on overlap),
    * then net-new incoming columns. */
  def appendNewColumns(existing: DataFrame, incoming: DataFrame): (DataFrame, DataFrame) = {
    val extra = incoming.schema.filterNot(f => existing.columns.contains(f.name))
    val names = existing.columns.toSeq ++ extra.map(_.name)
    val types = (extra.map(f => f.name -> f.dataType) ++
      existing.schema.map(f => f.name -> f.dataType)).toMap
    (alignTo(existing, names, types), alignTo(incoming, names, types))
  }

  /** Incoming schema wins entirely (order, membership and types). */
  def syncAllColumns(existing: DataFrame, incoming: DataFrame): (DataFrame, DataFrame) = {
    val names = incoming.columns.toSeq
    val types = incoming.schema.map(f => f.name -> f.dataType).toMap
    (alignTo(existing, names, types), alignTo(incoming, names, types))
  }
}
