package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.IncrementalMerge
import graft.sources.Tables

/** Streaming surface gated through the SAME oracle as the batch side:
  * q79 drives the real Structured-Streaming engine (file source →
  * checkpointed offsets → foreachBatch merge sink) over a deterministic
  * micro-batch split of `events` and gates the resulting table against
  * the batch answer — stream/batch equivalence proven by hash, not by
  * unit fixture.
  *
  * Scale shape: this is the production incremental-ingest loop. Each
  * batch merges into a date-partitioned target via the partition-pruned
  * IncrementalMerge (only partitions present in the batch are read or
  * rewritten); checkpointed file-source offsets make each restart resume
  * exactly where the previous run stopped — the restart-per-slice below
  * is deliberately the HARD path (recovery across three separate query
  * lifetimes), not a convenience.
  */
object StreamQueries {

  private def scratchDir(name: String): String =
    java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), name).toString

  val defs: Seq[QueryDef] = Seq(

    // Deterministic 3-slice ingest with an overlapping update: slice 0 =
    // event_id%3==0, slice 1 = event_id%3==1 PLUS re-delivered updates
    // (value+1000) for the %6==0 keys of slice 0, slice 2 = %3==2. Each
    // slice lands in the spool only after the previous streaming run has
    // terminated, so batch order (and therefore latest-wins) is exact.
    QueryDef(
      "q79_stream_merge_parity",
      (s, dir) => {
        val root = scratchDir("graft_stream_gate")
        // checkpoint offsets must not leak between runs: wipe the tree
        val rp = new org.apache.hadoop.fs.Path(root)
        val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(rp, true)
        val spool  = s"$root/spool"
        val target = s"$root/target"
        val ckpt   = s"$root/ckpt"

        val ev = Tables.events(s, dir).select(
          col("event_id"), col("user_id"), col("event_type"), col("value"),
          to_date(col("ts")).as("event_date"))

        val slices = Seq(
          ev.where(col("event_id") % 3 === 0),
          ev.where(col("event_id") % 3 === 1)
            .unionByName(ev.where(col("event_id") % 6 === 0)
              .withColumn("value", col("value") + lit(1000.0d))),
          ev.where(col("event_id") % 3 === 2))

        slices.zipWithIndex.foreach { case (slice, i) =>
          slice.write.mode("overwrite").parquet(s"$spool/batch_$i")
          val q = s.readStream.schema(ev.schema).parquet(s"$spool/*")
            .writeStream
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
              IncrementalMerge.mergeIntoPartitionedTarget(s, target, batch,
                Seq("event_id"), "event_date",
                stagePath = s"$root/stage_$id")
            }
            .start()
          q.awaitTermination()
        }

        s.read.parquet(target)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("event_date"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, event_type,
               CASE WHEN event_id % 6 = 0 THEN value + CAST(1000 AS DOUBLE)
                    ELSE value END AS value,
               CAST(ts AS DATE) AS event_date
        FROM events
        ORDER BY event_id""")))
}
