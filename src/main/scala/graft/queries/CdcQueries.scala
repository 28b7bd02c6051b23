package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.operators.IncrementalMerge
import graft.sources.Tables

/** Round-4 batch 10 — CDC apply with tombstones (q117): the missing
  * third verb of the merge surface. q20/q54 gate upsert merges; real
  * change-data feeds also DELETE, and latest-op-wins ordering within a
  * batch decides whether a key that was updated AND deleted survives.
  */
object CdcQueries {

  val defs: Seq[QueryDef] = Seq(

    // CDC batch over the orders "target": updates for keys %5==0,
    // tombstones for keys %11==0 (with ts AFTER the update for even keys
    // and BEFORE it for odd — so the %55 overlap exercises latest-op-wins
    // in both directions), inserts for fresh +2e9 keys. The merged state
    // rolls up per status with key and money checksums, so a wrong
    // survivor (or a resurrected tombstone) cannot hide.
    QueryDef(
      "q117_cdc_tombstones",
      (s, dir) => {
        val existing = Tables.orders(s, dir).select(
          col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
          dec6(col("o_totalprice")).as("price"))
        val updates = existing.where(col("k") % 5 === 0).select(
          col("k"), lit("U").as("op"),
          lit("2024-03-01 01:00:00").cast("timestamp").as("ts"),
          lit("U").as("status"),
          (col("price") + lit(10)).cast(DecimalType(18, 6)).as("price"))
        val deletes = existing.where(col("k") % 11 === 0).select(
          col("k"), lit("D").as("op"),
          when(col("k") % 2 === 0, lit("2024-03-01 01:30:00"))
            .otherwise(lit("2024-03-01 00:30:00")).cast("timestamp").as("ts"),
          lit(null).cast("string").as("status"),
          lit(null).cast(DecimalType(18, 6)).as("price"))
        val inserts = existing.where(col("k") % 7 === 0).select(
          (col("k") + 2000000000L).as("k"), lit("I").as("op"),
          lit("2024-03-01 01:00:00").cast("timestamp").as("ts"),
          lit("N").as("status"),
          lit(BigDecimal(1)).cast(DecimalType(18, 6)).as("price"))
        val cdc = updates.unionByName(deletes).unionByName(inserts)
        val merged = IncrementalMerge.applyCdc(existing, cdc, Seq("k"),
          "op", Seq(col("ts")))
        merged.groupBy(col("status"))
          .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("key_checksum"),
            moneyOut(sum(col("price"))).as("price_sum"))
          .orderBy(col("status"))
      },
      Some("""
        WITH existing AS (
          SELECT o_orderkey AS k, o_orderstatus AS status,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS price
          FROM orders),
        cdc AS (
          SELECT k, 'U' AS op, TIMESTAMP '2024-03-01 01:00:00' AS ts,
                 'U' AS status, CAST(price + 10 AS DECIMAL(18,6)) AS price
          FROM existing WHERE k % 5 = 0
          UNION ALL
          SELECT k, 'D',
                 CASE WHEN k % 2 = 0 THEN TIMESTAMP '2024-03-01 01:30:00'
                      ELSE TIMESTAMP '2024-03-01 00:30:00' END,
                 NULL, NULL
          FROM existing WHERE k % 11 = 0
          UNION ALL
          SELECT k + 2000000000, 'I', TIMESTAMP '2024-03-01 01:00:00',
                 'N', CAST(1 AS DECIMAL(18,6))
          FROM existing WHERE k % 7 = 0),
        latest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY k ORDER BY ts DESC) AS rn
            FROM cdc) WHERE rn = 1),
        merged AS (
          SELECT e.k, e.status, e.price FROM existing e
          WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.k = e.k)
          UNION ALL
          SELECT k, status, price FROM latest WHERE op <> 'D')
        SELECT status, COUNT(*) AS n_rows,
               CAST(SUM(k) AS BIGINT) AS key_checksum,
               CAST(CAST(SUM(price) AS DECIMAL(38,6)) AS DOUBLE) AS price_sum
        FROM merged
        GROUP BY status
        ORDER BY status""")))
}
