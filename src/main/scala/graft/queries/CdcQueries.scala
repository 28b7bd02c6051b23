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
        ORDER BY status""")),

    // Snapshot-sync merge — the "not matched by source → delete" verb
    // that completes the merge family (q20 upsert, q117 tombstones):
    // make the target mirror a full source snapshot — upsert everything
    // present, DELETE target keys the snapshot no longer carries. Within
    // a partition scope this is how full-feed vendors sync at 100 TB:
    // source ⟕ target on the key, one exchange, no per-row ops. The gate
    // classifies every key (kept/updated/inserted/deleted) with
    // checksums, so a resurrected or lost key cannot hide.
    QueryDef(
      "q137_snapshot_sync",
      (s, dir) => {
        val target = Tables.orders(s, dir).select(
          col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
          dec6(col("o_totalprice")).as("price"))
        // snapshot: keys %7==0 gone, %5==0 re-priced, +3e9 keys new
        val snapshot = target.where(col("k") % 7 =!= 0)
          .select(col("k"),
            when(col("k") % 5 === 0, lit("R")).otherwise(col("status")).as("status"),
            when(col("k") % 5 === 0, (col("price") + lit(5)).cast(DecimalType(18, 6)))
              .otherwise(col("price")).as("price"))
          .unionByName(target.where(col("k") % 11 === 0).select(
            (col("k") + 3000000000L).as("k"), lit("A").as("status"), col("price")))
        // sync = snapshot IS the new target; classification joins both ways
        val cls = snapshot.join(target.select(col("k"),
              col("status").as("old_status"), col("price").as("old_price")),
            Seq("k"), "full_outer")
          .select(col("k"),
            when(col("status").isNull, "deleted")
              .when(col("old_status").isNull, "inserted")
              .when(col("status") === col("old_status") &&
                col("price") === col("old_price"), "kept")
              .otherwise("updated").as("change"))
        cls.groupBy(col("change"))
          .agg(count(lit(1)).as("n_keys"), sum(col("k")).as("key_checksum"))
          .orderBy(col("change"))
      },
      Some("""
        WITH target AS (
          SELECT o_orderkey AS k, o_orderstatus AS status,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS price
          FROM orders),
        snapshot AS (
          SELECT k,
                 CASE WHEN k % 5 = 0 THEN 'R' ELSE status END AS status,
                 CASE WHEN k % 5 = 0 THEN CAST(price + 5 AS DECIMAL(18,6))
                      ELSE price END AS price
          FROM target WHERE k % 7 <> 0
          UNION ALL
          SELECT k + 3000000000, 'A', price FROM target WHERE k % 11 = 0),
        cls AS (
          SELECT COALESCE(s.k, t.k) AS k,
                 CASE WHEN s.k IS NULL THEN 'deleted'
                      WHEN t.k IS NULL THEN 'inserted'
                      WHEN s.status = t.status AND s.price = t.price THEN 'kept'
                      ELSE 'updated' END AS change
          FROM snapshot s FULL OUTER JOIN target t ON s.k = t.k)
        SELECT change, COUNT(*) AS n_keys,
               CAST(SUM(k) AS BIGINT) AS key_checksum
        FROM cls
        GROUP BY change
        ORDER BY change""")),

    // CDC GENERATION (the inverse of q117's CDC apply): derive the
    // insert/update/delete op stream that turns snapshot OLD into
    // snapshot NEW — the export side of change capture, built from a
    // full-outer join on the key with exact cent deltas riding along.
    // OLD excludes the %11 keys (-> inserts), NEW drops the %13 keys
    // (-> deletes) and bumps %7 prices by one dollar (-> updates);
    // everything else is a noop and NEVER emitted (the op stream must
    // stay proportional to the CHANGE, not the table — that is the
    // whole point of CDC at 100 TB). Payload deltas are exact cents.
    QueryDef(
      "q164_cdc_generate",
      (s, dir) => {
        val base = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
        val oldS = base.where(col("k") % 11 =!= 0)
          .select(col("k"), col("cents").as("old_cents"))
        val newS = base.where(col("k") % 13 =!= 0)
          .select(col("k"),
            (col("cents") + when(col("k") % 7 === 0, 100L).otherwise(0L))
              .as("new_cents"))
        val ops = oldS.join(newS, Seq("k"), "full_outer")
          .withColumn("op",
            when(col("old_cents").isNull, "I")
              .when(col("new_cents").isNull, "D")
              .when(col("old_cents") =!= col("new_cents"), "U"))
          .where(col("op").isNotNull)
        ops.groupBy(col("op"))
          .agg(count(lit(1)).as("n_ops"),
            sum(col("k")).as("key_checksum"),
            sum(coalesce(col("new_cents"), lit(0L))
              - coalesce(col("old_cents"), lit(0L))).as("delta_cents"))
          .orderBy(col("op"))
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS k,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM orders),
        olds AS (
          SELECT k, cents AS old_cents FROM base WHERE k % 11 <> 0),
        news AS (
          SELECT k, cents + CASE WHEN k % 7 = 0 THEN 100 ELSE 0 END AS new_cents
          FROM base WHERE k % 13 <> 0),
        ops AS (
          SELECT COALESCE(o.k, n.k) AS k, o.old_cents, n.new_cents,
                 CASE WHEN o.k IS NULL THEN 'I'
                      WHEN n.k IS NULL THEN 'D'
                      WHEN o.old_cents <> n.new_cents THEN 'U' END AS op
          FROM olds o FULL OUTER JOIN news n ON o.k = n.k)
        SELECT op, CAST(COUNT(*) AS BIGINT) AS n_ops,
               CAST(SUM(k) AS BIGINT) AS key_checksum,
               CAST(SUM(COALESCE(new_cents, 0) - COALESCE(old_cents, 0))
                 AS BIGINT) AS delta_cents
        FROM ops WHERE op IS NOT NULL
        GROUP BY op
        ORDER BY op""")))
}
