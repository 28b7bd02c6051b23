package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.functions.Kernels

/** Typed staging projection — the reference's cast-all-columns pattern
  * (every staging model safe-casts and renames its full column list, e.g.
  * reference models/staging/stg_customers.sql:9-42). `conform` applies a
  * declared (rename, type) spec in one projection: try_cast semantics
  * (malformed → null, never a job failure), blank-string normalization on
  * string targets, and dropped columns pruned at the scan by Catalyst.
  */
object Staging {

  /** One target column: source name → (target name, type). */
  final case class Field(from: String, to: String, dataType: DataType,
      blankToNull: Boolean = false)

  def field(from: String, to: String, dt: DataType,
      blankToNull: Boolean = false): Field = Field(from, to, dt, blankToNull)

  /** Project `df` to exactly the declared fields, safe-casting each.
    * Columns not listed are dropped (and column-pruned at the source). */
  def conform(df: DataFrame, fields: Seq[Field]): DataFrame = {
    val cols = fields.map { f =>
      val base: Column = try_cast(col(f.from), f.dataType)
      val v = if (f.blankToNull) Kernels.nullifTrim(base.cast("string")).cast(f.dataType)
              else base
      v.as(f.to)
    }
    df.select(cols: _*)
  }

  private def try_cast(c: Column, dt: DataType): Column =
    c.try_cast(dt)
}
