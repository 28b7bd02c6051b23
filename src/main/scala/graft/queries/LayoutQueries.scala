package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.functions.Kernels.md5Lower64
import graft.functions.TextKernels.tokens
import graft.operators.TextDedup
import graft.sources.Tables

/** Data-layout + membership-sketch operators, round 4 batch 3:
  *
  *  - q90: Z-order (Morton) clustering keys — the multi-dimensional
  *    data-layout technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`:
  *    interleave the bits of two scan dimensions so range predicates on
  *    EITHER dimension prune file-level min/max zones. At 100 TB this
  *    is the difference between scanning 1/k of the files and all of
  *    them for a dimension the table is not sorted by.
  *  - q91: Bloom-filter incremental dedup — the streaming/batch
  *    membership sketch for "is this fingerprint already in the
  *    corpus" without joining against 100 TB of history. The sketch is
  *    built distributively (map-side partial bit-arrays OR-merged —
  *    order-independent, so the result is deterministic at any
  *    parallelism), ships as a broadcast-constant binary, and probes
  *    as a codegen'd predicate — the same mechanism as Spark's own
  *    runtime-filter join optimization.
  */
object LayoutQueries {

  /** Morton/Z-value: interleave the low 16 bits of x into even bit
    * positions and y into odd positions. Unrolled to 32 codegen'd
    * shift/and/shift terms (no higher-order functions, no UDF); both
    * engines evaluate the identical integer arithmetic. */
  private def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  private def zValueSql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  val defs: Seq[QueryDef] = Seq(

    // Z-order layout audit over orders(custkey × orderdate). Computes
    // the Morton key, buckets the keyspace into file-sized zones
    // (z >> 22 → ≤1024 zones), and reports each zone's min/max span in
    // BOTH dimensions — the exact min/max statistics a lakehouse scan
    // planner prunes on. The whole query is one codegen'd projection +
    // one hash agg; the z-key computation itself is the operator under
    // test (it is what an OPTIMIZE ZORDER write would sort by).
    QueryDef(
      "q90_zorder_layout",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val x = col("o_custkey")
        val y = datediff(col("o_orderdate").cast("date"),
          to_date(lit("1995-01-01"))).cast("long")
        o.select(col("o_orderkey"), x.as("x"), y.as("y"))
          .select(col("o_orderkey"), col("x"), col("y"),
            zValue(col("x"), col("y")).as("z"))
          .groupBy(shiftright(col("z"), 16).as("zone"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("x")).as("min_cust"), max(col("x")).as("max_cust"),
            min(col("y")).as("min_day"), max(col("y")).as("max_day"),
            min(col("z")).as("min_z"), max(col("z")).as("max_z"))
          .select(col("zone"), col("n_orders"),
            col("min_cust"), col("max_cust"), col("min_day"), col("max_day"),
            (col("max_cust") - col("min_cust") + 1).as("cust_span"),
            (col("max_day") - col("min_day") + 1).as("day_span"),
            col("min_z"), col("max_z"))
          .orderBy(col("zone"))
      },
      Some(s"""
        WITH d AS (
          SELECT o_orderkey, o_custkey AS x,
                 CAST(date_diff('day', DATE '1995-01-01',
                                CAST(o_orderdate AS DATE)) AS BIGINT) AS y
          FROM orders),
        z AS (
          SELECT o_orderkey, x, y, ${zValueSql("x", "y")} AS z FROM d)
        SELECT z >> 16 AS zone, COUNT(*) AS n_orders,
               MIN(x) AS min_cust, MAX(x) AS max_cust,
               MIN(y) AS min_day, MAX(y) AS max_day,
               MAX(x) - MIN(x) + 1 AS cust_span,
               MAX(y) - MIN(y) + 1 AS day_span,
               MIN(z) AS min_z, MAX(z) AS max_z
        FROM z
        GROUP BY 1
        ORDER BY zone""")),

    // Bloom-filter incremental dedup. "Existing corpus" = hash-split
    // buckets 0-79, "new batch" = buckets 80-99 (q58's deterministic
    // split). The existing side's winnowing fingerprints feed a
    // distributed bloom build (DataFrameStatFunctions.bloomFilter — a
    // treeAggregate whose partials are OR-merged bit arrays; the
    // collected object is the ~100 KB sketch, never data). New-batch
    // fingerprints probe the broadcast sketch via the codegen'd
    // BloomFilterMightContain predicate. The gate asserts the two
    // properties a bloom filter must satisfy — zero false negatives
    // (every exact duplicate flagged) and a bounded false-positive
    // count — as booleans the oracle pins to literal true, plus the
    // exactly-predictable counts (same stance as q46's sketch bounds).
    QueryDef(
      "q91_bloom_incremental",
      (s, dir) => {
        val spark = s
        val d = Tables.documents(spark, dir)
        val wfp = TextDedup.minShingleFingerprints(
            TextDedup.shingleRows(
              d.select(col("doc_id"), tokens(col("text")).as("ws")),
              "doc_id", "ws", 3),
            "doc_id", "_sh")
          .withColumn("bucket",
            Kernels.md5BitsModK(Kernels.md5Bits(concat(lit("split:"), col("doc_id"))), 100L))
        // Bloom insert/probe key: re-hash the fingerprint string to a
        // raw long (the sketch and the MightContain predicate operate
        // on the putLong/mightContainLong fast path).
        val existing = wfp.where(col("bucket") < 80)
          .select(col("winnow_fp"), Kernels.md5Bits(col("winnow_fp")).as("fp_long"))
        val fresh = wfp.where(col("bucket") >= 80)
          .select(col("doc_id"), col("winnow_fp"),
            Kernels.md5Bits(col("winnow_fp")).as("fp_long"))

        // Distributed sketch build; 8192 expected items / 1% fpp →
        // ~10 KB of bits. Capacity is a config knob at scale, not code.
        val bloom = existing.stat.bloomFilter("fp_long", 8192L, 0.01)
        val bytes = {
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          bos.toByteArray
        }
        import org.apache.spark.sql.GraftSqlBridge.{column, expression}
        val mightContain = column(
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            expression(lit(bytes)), expression(col("fp_long"))))

        val flagged = fresh.select(col("doc_id"), col("winnow_fp"),
          mightContain.as("flagged"))
        val truth = existing.select(col("winnow_fp")).distinct()
          .withColumn("is_dup", lit(true))
        val joined = flagged.join(truth, Seq("winnow_fp"), "left")
          .select(col("doc_id"), col("flagged"),
            coalesce(col("is_dup"), lit(false)).as("is_dup"))
        joined.agg(
            count(lit(1)).as("n_new"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
            min(when(col("is_dup"), col("flagged").cast("int")).otherwise(1))
              .cast("boolean").as("no_false_negatives"),
            (sum(when(!col("is_dup") && col("flagged"), 1L).otherwise(0L)) <=
              ceil(count(lit(1)) * lit(0.05d))).as("fp_rate_ok"))
          .orderBy(col("n_new"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        sh AS (
          SELECT doc_id, list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS s
          FROM toks),
        fp AS (
          SELECT doc_id,
                 list_min(list_transform(s, x -> md5_number_lower(x)))::VARCHAR
                   AS winnow_fp,
                 CAST(md5_number_lower('split:' || doc_id) % 100 AS BIGINT) AS bucket
          FROM sh),
        existing AS (SELECT winnow_fp FROM fp WHERE bucket < 80),
        fresh AS (SELECT doc_id, winnow_fp FROM fp WHERE bucket >= 80)
        SELECT COUNT(*) AS n_new,
               CAST(SUM(CASE WHEN winnow_fp IN (SELECT winnow_fp FROM existing)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
               true AS no_false_negatives,
               true AS fp_rate_ok
        FROM fresh
        ORDER BY n_new""")))
}
