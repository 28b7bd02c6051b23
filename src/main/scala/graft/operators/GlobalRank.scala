package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without a single-partition global sort.
  *
  * `row_number()/ntile(k)` over `Window.orderBy(...)` (no partition keys)
  * moves the whole input through ONE task — Spark even warns
  * "No Partition Defined for Window operation". Correct at sf0.1,
  * fatal at 100 TB. This helper computes the identical rank with the
  * two-level bucketed cumulative scheme (the same construction q236's
  * KS statistic and q242's isotonic binning already use):
  *
  *   1. bucket every row by a caller-supplied MONOTONE COARSENING of the
  *      total order (see contract below);
  *   2. aggregate per-bucket row counts — a table orders of magnitude
  *      smaller than the input — and prefix-sum those counts into
  *      per-bucket rank offsets (the only unpartitioned window, over the
  *      bounded bucket table);
  *   3. rank rows WITHIN each bucket (partitioned window), and add the
  *      broadcast bucket offset.
  *
  * Bucket contract: for any rows a, b — if bucket(a) < bucket(b) then a
  * precedes b in the total order `orderCols`. Equivalently the bucket is
  * a prefix-coarsening of the sort key: `v div 65536` for a wide-range
  * numeric leading key, `struct(k1, tiebreak div K)` when k1 is the full
  * leading key and the refinement divides the tiebreak column itself.
  * A refinement by a column that is NOT part of the already-fixed order
  * prefix violates the contract (rows would interleave across buckets).
  */
object GlobalRank {

  /** Adds `rankCol` = exact 1-based `row_number()` under the total order
    * `orderCols`, computed distributively per the scheme above.
    *
    * The input subtree is consumed TWICE (bucket counts + the ranked
    * join). A plain projected scan pays one extra columnar read — fine;
    * callers passing an EXPENSIVE frame (an aggregate, a join) should
    * materialize it first with `CheckpointPolicy` / `cutLineage()` (the repo's
    * pin-neutral pattern) or the subtree recomputes per reference —
    * and doubles per call when chaining ranks on one frame.
    */
  def withGlobalRank(
      df: DataFrame,
      rankCol: String,
      bucket: Column,
      orderCols: Column*): DataFrame = {
    val b = df.withColumn("__gr_bkt", bucket)
    val wOff = Window.orderBy(col("__gr_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = b.groupBy(col("__gr_bkt"))
      .agg(count(lit(1)).as("__gr_bcnt"))
      .withColumn("__gr_off", coalesce(sum(col("__gr_bcnt")).over(wOff), lit(0L)))
      .select(col("__gr_bkt"), col("__gr_off"))
    val wIn = Window.partitionBy(col("__gr_bkt")).orderBy(orderCols: _*)
    b.join(broadcast(boff), "__gr_bkt")
      .withColumn(rankCol, col("__gr_off") + row_number().over(wIn))
      .drop("__gr_bkt", "__gr_off")
  }

  /** Exact integer division for non-negative operands, expressed in
    * codegen-friendly primitives (`pmod` + exact double divide of a
    * multiple — exact below 2^53).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** SQL-standard `ntile(k)` reconstructed from an exact global rank
    * `rn` (1-based) and total row count `n`: the first `n mod k` tiles
    * hold `n div k + 1` rows, the rest `n div k` — byte-identical to
    * Spark's and DuckDB's ntile over the same total order.
    */
  def ntileFromRank(rn: Column, n: Column, k: Int): Column = {
    val kc = lit(k.toLong)
    val q = idiv(n, kc)
    val r = pmod(n, kc)
    val cut = r * (q + lit(1L))
    when(rn <= cut, idiv(rn - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(r + idiv(rn - lit(1L) - cut, q) + lit(1L))
  }

  /** Inverts a ranked distribution: hands every target row the pooled
    * value whose rank interval covers the target's rank — `sorted[t]`
    * without ever materializing (or single-partition-sorting) the
    * row-expanded distribution. The quantile-normalization /
    * exact-quantile-lookup primitive (q363's core, factored).
    *
    * `pool` carries one row per DISTINCT value: (`valueCol`,
    * `cumLtCol` = count of strictly-smaller rows, `cntCol` = multiplicity)
    * — exactly what [[withGlobalRank]]-style two-level counting produces.
    * `targets` carries `rankCol` ∈ [1, N]. Returns `targets`' columns
    * plus `outCol` = the pooled value at that rank.
    *
    * Scale contract: pooled intervals explode one row per `blockSize`-wide
    * rank BLOCK they touch (P + N/blockSize rows total — linear, never
    * P×blocks), targets key by block, and ONE block-partitioned carry
    * window (`last_value` ignoring nulls over (rank, kind,
    * interval-start)) resolves the covering interval — ≤ blockSize ranks
    * of work per task, deterministic under boundary clamps (the start
    * tiebreak orders same-boundary intervals by true start).
    *
    * Precondition: `cntCol` ≥ 1 on every pool row. A zero-count row has
    * a DESCENDING `sequence(lt div B, (lt+c-1) div B)` (Spark counts
    * down when start > stop), emitting phantom zero-width intervals
    * that can tie a real interval at a block boundary and shadow the
    * correct carry nondeterministically — so zero-count rows are
    * filtered here, defensively, before the explode.
    */
  def valueAtRank(
      pool: DataFrame,
      valueCol: String,
      cumLtCol: String,
      cntCol: String,
      targets: DataFrame,
      rankCol: String,
      outCol: String,
      blockSize: Long = 4096L): DataFrame = {
    val B = blockSize
    val vType = pool.schema(valueCol).dataType
    val payload = struct(targets.columns.map(col): _*)
    val t = targets.select(
      expr(s"($rankCol - 1) div $B").as("__b"),
      col(rankCol).cast("long").as("__rank"),
      lit(1L).as("__ist"),
      lit(null).cast(vType).as("__pv"),
      col(rankCol).cast("long").as("__srt"),
      payload.as("__pay"))
    val p = pool.where(col(cntCol) >= 1)
      .select(col(valueCol).as("__pv"),
        col(cumLtCol).cast("long").as("__lt"),
        col(cntCol).cast("long").as("__c"))
      .withColumn("__b", explode(expr(
        s"sequence(__lt div $B, (__lt + __c - 1) div $B)")))
      .select(col("__b"),
        greatest(col("__lt") + 1, col("__b") * B + 1).as("__rank"),
        lit(0L).as("__ist"), col("__pv"), col("__lt").as("__srt"),
        lit(null).cast(t.schema("__pay").dataType).as("__pay"))
    val wc = Window.partitionBy(col("__b"))
      .orderBy(col("__rank"), col("__ist"), col("__srt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(t)
      .withColumn(outCol, last(col("__pv"), ignoreNulls = true).over(wc))
      .where(col("__ist") === 1L)
      .select(targets.columns.map(c => col(s"__pay.$c")) :+ col(outCol): _*)
  }
}
