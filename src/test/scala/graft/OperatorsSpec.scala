package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, IncrementalMerge, TextDedup}

/** Operator semantics on tiny in-memory frames: dedup ties, as-of joins
  * with and without candidates, incremental-merge overlap. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("Dedup.keepLatest breaks recency ties by tiebreak desc") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (1L, "b", ts("2024-01-01 00:00:00")), // same recency, higher tiebreak
      (1L, "c", ts("2023-12-31 00:00:00")),
      (2L, "d", ts("2024-01-01 00:00:00"))).toDF("k", "v", "t")
    val got = Dedup.keepLatest(df, Seq(col("k")), col("t"), col("v"))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(got == Seq("b", "d"))
  }

  test("Dedup.keepLatest puts null recency last") {
    val df = Seq(
      (1L, "a", Option.empty[Timestamp]),
      (1L, "b", Some(ts("2020-01-01 00:00:00")))).toDF("k", "v", "t")
    val got = Dedup.keepLatest(df, Seq(col("k")), col("t"), col("v"))
      .select("v").as[String].head()
    assert(got == "b")
  }

  test("Dedup.duplicateKeys returns only keys with count > 1") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val got = Dedup.duplicateKeys(df, Seq(col("k"))).collect()
    assert(got.length == 1 && got(0).getInt(0) == 1 && got(0).getLong(1) == 2L)
  }

  test("AsOfJoin.bestAtTime prefers at-or-before, else nearest after; keeps no-candidate rows") {
    val left = Seq(
      (10L, 1L, ts("2024-01-05 00:00:00")),
      (11L, 2L, ts("2024-01-05 00:00:00")), // candidates only after
      (12L, 3L, ts("2024-01-05 00:00:00"))) // no candidates at all
      .toDF("pk", "k", "t")
    val right = Seq(
      (100L, 1L, ts("2024-01-04 00:00:00")), // best: latest at-or-before
      (101L, 1L, ts("2024-01-01 00:00:00")),
      (102L, 1L, ts("2024-01-05 00:00:01")), // nearer in abs time but after
      (200L, 2L, ts("2024-01-06 00:00:00")),
      (201L, 2L, ts("2024-01-07 00:00:00")))
      .toDF("cand", "k", "ct")
    val got = AsOfJoin.bestAtTime(left, right, Seq("k"),
        leftTs = col("t"), rightTs = col("ct"), tiebreakCol = "cand")
      .orderBy("pk").select("pk", "cand").collect()
    assert(got.map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq ==
      Seq((10L, 100L), (11L, 200L), (12L, -1L)))
  }

  test("AsOfJoin.bestAtTime equal-timestamp candidate counts as at-or-before") {
    val left = Seq((1L, 1L, ts("2024-01-05 00:00:00"))).toDF("pk", "k", "t")
    val right = Seq(
      (7L, 1L, ts("2024-01-05 00:00:00")),
      (8L, 1L, ts("2024-01-04 23:59:59"))).toDF("cand", "k", "ct")
    val got = AsOfJoin.bestAtTime(left, right, Seq("k"),
        col("t"), col("ct"), "cand")
      .select("cand").as[Long].head()
    assert(got == 7L)
  }

  test("IncrementalMerge.merge: fresh wins on key overlap, keeps disjoint existing") {
    val existing = Seq((1L, "old1"), (2L, "old2")).toDF("k", "v")
    val fresh = Seq((2L, "new2"), (3L, "new3")).toDF("k", "v")
    val got = IncrementalMerge.merge(existing, fresh, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "old1"), (2L, "new2"), (3L, "new3")))
  }

  test("IncrementalMerge.mergeIntoPartitionedTarget creates, upserts, and prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    val target = s"$dir/t"
    def fresh(rows: (Long, String, String)*) =
      rows.toDF("k", "v", "dt")
    // first merge: target does not exist yet → plain create
    IncrementalMerge.mergeIntoPartitionedTarget(spark, target,
      fresh((1L, "a1", "d1"), (2L, "b1", "d2")), Seq("k"), "dt", s"$dir/s1")
    // second merge touches only d2: update key 2, add key 3
    val d1Files = new java.io.File(s"$target/dt=d1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
    IncrementalMerge.mergeIntoPartitionedTarget(spark, target,
      fresh((2L, "b2", "d2"), (3L, "c1", "d2")), Seq("k"), "dt", s"$dir/s2")
    val got = spark.read.parquet(target)
      .select(col("k"), col("v"), col("dt").cast("string"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a1", "d1"), (2L, "b2", "d2"), (3L, "c1", "d2")))
    val d1After = new java.io.File(s"$target/dt=d1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
    assert(d1After === d1Files, "untouched partition rewritten")
    assert(!new java.io.File(s"$dir/s2").exists(), "staging dir must be cleaned")
  }

  test("Scd2.merge: change versions, no-change skips, stale batch ignored, history untouched") {
    val ts0 = Timestamp.valueOf("2023-12-01 00:00:00")
    val t1  = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2  = Timestamp.valueOf("2024-02-01 00:00:00")
    val existing = Seq(
      (1L, "a", ts0, t1: Timestamp),   // history row (closed earlier)
      (1L, "b", t1, null: Timestamp),  // current, will change
      (2L, "c", t1, null: Timestamp),  // current, batch identical → no version
      (3L, "d", t1, null: Timestamp),  // current, batch STALE → ignored
      (4L, "e", t1, null: Timestamp)   // current, absent from batch
    ).toDF("k", "v", "valid_from", "valid_to")
    val fresh = Seq(
      (1L, "b2", t2),  // changed
      (2L, "c", t2),   // identical payload
      (3L, "d2", ts0), // older than current valid_from → stale
      (9L, "z", t2)    // brand-new key
    ).toDF("k", "v", "updated_at")
    val got = graft.operators.Scd2.merge(existing, fresh, "k", Seq("v"), "updated_at")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)))).toSeq
    assert(got === Seq(
      (1L, "a", ts0, Some(t1)),   // history passes through
      (1L, "b", t1, Some(t2)),    // closed at batch time
      (1L, "b2", t2, None),       // new current version
      (2L, "c", t1, None),        // unchanged → still current, NOT versioned
      (3L, "d", t1, None),        // stale batch ignored
      (4L, "e", t1, None),        // untouched key stays current
      (9L, "z", t2, None)))       // first version of a new key
  }

  test("Scd2.mergeIntoPartitionedSnapshot: history appends; untouched close-month partitions never rewrite") {
    import graft.operators.Scd2
    val root = java.nio.file.Files.createTempDirectory("scd2snap").toString
    val target = s"$root/snap"
    def run(rows: Seq[(Long, String, Timestamp)], i: Int): Unit =
      Scd2.mergeIntoPartitionedSnapshot(spark, target,
        rows.toDF("k", "v", "updated_at"), "k", Seq("v"), "updated_at",
        stagePath = s"$root/stage_$i")
    def partFiles(month: String): Map[String, Long] = {
      val d = new java.io.File(s"$target/${Scd2.PartitionCol}=$month")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val jan = Timestamp.valueOf("2024-01-10 00:00:00")
    val feb = Timestamp.valueOf("2024-02-05 00:00:00")
    val mar = Timestamp.valueOf("2024-03-07 00:00:00")

    run(Seq((1L, "a1", jan), (2L, "b1", jan)), 0)     // first versions
    run(Seq((1L, "a2", feb)), 1)                      // closes k=1 in 2024-02
    val febFiles = partFiles("2024-02")
    assert(febFiles.nonEmpty, "close must land in its valid_to month")
    run(Seq((2L, "b2", mar)), 2)                      // closes k=2 in 2024-03
    // the 2024-02 partition was neither read-rewritten nor touched
    assert(partFiles("2024-02") === febFiles,
      "untouched close-month partition must not be rewritten")
    assert(partFiles("2024-03").nonEmpty)

    val got = spark.read.parquet(target)
      .select(col("k"), col("v"), col("valid_from"), col("valid_to"))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)))).toSeq
    assert(got === Seq(
      (1L, "a1", jan, Some(feb)), (1L, "a2", feb, None),
      (2L, "b1", jan, Some(mar)), (2L, "b2", mar, None)))
  }

  test("mergeIntoPartitionedTarget fails fast past the touched-partition cap, target untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cap").toString
    val target = s"$dir/t"
    val fresh = (1 to 5).map(i => (i.toLong, s"v$i", s"d$i")).toDF("k", "v", "dt")
    val e = intercept[IllegalStateException] {
      IncrementalMerge.mergeIntoPartitionedTarget(spark, target,
        fresh, Seq("k"), "dt", s"$dir/s", maxTouched = 3)
    }
    assert(e.getMessage.contains("distinct 'dt' partitions"))
    assert(!new java.io.File(target).exists(),
      "cap must fire before any write reaches the target")
    // the default cap (10k) admits the same batch
    IncrementalMerge.mergeIntoPartitionedTarget(spark, target,
      fresh, Seq("k"), "dt", s"$dir/s2")
    assert(spark.read.parquet(target).count() === 5)
  }

  test("mergeIntoPartitionedSnapshot fails fast past the touched-month cap") {
    import graft.operators.Scd2
    val root = java.nio.file.Files.createTempDirectory("scd2cap").toString
    val target = s"$root/snap"
    // seed the target (cap only guards the incremental path)
    Scd2.mergeIntoPartitionedSnapshot(spark, target,
      Seq((1L, "a", Timestamp.valueOf("2024-01-10 00:00:00")))
        .toDF("k", "v", "updated_at"),
      "k", Seq("v"), "updated_at", stagePath = s"$root/s0")
    val wide = (1 to 4).map(m =>
      (m.toLong, s"v$m", Timestamp.valueOf(f"2024-0${m + 1}%d-01 00:00:00")))
      .toDF("k", "v", "updated_at")
    val e = intercept[IllegalStateException] {
      Scd2.mergeIntoPartitionedSnapshot(spark, target, wide,
        "k", Seq("v"), "updated_at", stagePath = s"$root/s1", maxTouched = 2)
    }
    assert(e.getMessage.contains("distinct close months"))
  }

  test("IncrementalMerge.mergeWithLookback filters fresh side first") {
    val existing = Seq((1L, 10, "old1"), (2L, 20, "old2")).toDF("k", "d", "v")
    val source = Seq((2L, 99, "new2"), (3L, 5, "too_old")).toDF("k", "d", "v")
    val got = IncrementalMerge.mergeWithLookback(existing, source, Seq("k"), col("d") >= 50)
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(got == Seq("old1", "new2"))
  }

  test("ngramHash62 is a collision-free stand-in for string shingles") {
    // Same window structure as shingleRows (one hash row per full
    // k-window), and equal k-grams ⇔ equal 62-bit keys on this corpus —
    // the property q87's decontamination join depends on.
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "c d e f g h i"),
      (3L, "a b c d e f g"), (4L, "x y"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val k = 5
    val str = TextDedup.shingleRows(docs, "doc_id", "ws", k)
      .select(col("doc_id"), col("_sh"))
    val num = TextDedup.ngramHash62(docs, "doc_id", "ws", k)
    assert(num.count() === str.count())          // same window structure
    // the equivalence relation "docs A and B share n distinct k-grams"
    // must be identical under both representations
    def sharedPairs(df: org.apache.spark.sql.DataFrame, key: String) = {
      val d = df.distinct()
      val l = d.toDF("da", key)
      val r = d.toDF("db", key)
      l.join(r, key).where(col("da") < col("db"))
        .groupBy(col("da"), col("db")).count()
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    }
    val viaStr = sharedPairs(str, "_sh")
    val viaNum = sharedPairs(num, "h62")
    assert(viaStr === viaNum)
    assert(viaStr.contains((1L, 3L, 3L)), "identical docs share all 3 grams")
    // per-doc distinct counts agree (no within-doc collisions)
    val dcStr = str.distinct().groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dcNum = num.distinct().groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dcStr === dcNum)
  }

  test("bestAtTimeWithin: tolerance gates each side; preference order kept") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 12:00:00")),  // before@11:00 in tol → match
      (2L, 200L, ts("2024-01-01 12:00:00")),  // before@08:00 out, after@12:30 in → after
      (3L, 300L, ts("2024-01-01 12:00:00")))  // only@18:00 out of tol → none
      .toDF("k", "lv", "lts")
    val right = Seq(
      (1L, 10L, ts("2024-01-01 11:00:00")),
      (2L, 20L, ts("2024-01-01 08:00:00")),
      (2L, 21L, ts("2024-01-01 12:30:00")),
      (3L, 30L, ts("2024-01-01 18:00:00")))
      .toDF("k", "rv", "rts")
    val got = graft.operators.AsOfJoin.bestAtTimeWithin(
        left, right, Seq("k"), col("lts"), col("rts"), "rv",
        expr("INTERVAL 2 HOURS"))
      .orderBy("k")
      .select("k", "rv", "matched_side")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse("none")))
    assert(got.toSeq == Seq(
      (1L, 10L, "before"), (2L, 21L, "after"), (3L, -1L, "none")))
  }

  test("applyCdc: latest-op-wins, tombstones delete, absent-key delete is a no-op") {
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val cdc = Seq(
      (1L, "U", 1, "a2"),   // plain update
      (2L, "U", 1, "b2"),   // update at t=1 ...
      (2L, "D", 2, null),   // ... then delete at t=2 → key 2 gone
      (3L, "D", 1, null),   // delete at t=1 ...
      (3L, "U", 2, "c2"),   // ... then update at t=2 → key 3 survives updated
      (9L, "D", 1, null),   // delete of a key that never existed → no-op
      (4L, "I", 1, "d"))    // brand-new key
      .toDF("k", "op", "t", "v")
    val got = IncrementalMerge.applyCdc(existing, cdc, Seq("k"), "op", Seq(col("t")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a2"), (3L, "c2"), (4L, "d")))
  }
}
