package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Materialized ANN index — the BUILD-ONCE / PROBE-MANY seam
  * (round-9 verdict item 3).
  *
  * q31/q45 demonstrate SRP-LSH and IVF semantics, but they rebuild the
  * bucket/cell structure inline inside one query. A production corpus
  * pipeline builds the index ONCE (a heavy full-corpus pass) and probes
  * it MANY times (cheap per-query work against the materialized
  * layout). This object is that seam:
  *
  *   - `buildSrp` / `buildIvf` write the index as parquet PARTITIONED
  *     BY the coarse key (SRP bucket / IVF cell). The directory layout
  *     is the index: a probe joins on the partition column with a
  *     broadcast query side, so Spark's dynamic partition pruning reads
  *     ONLY the probed buckets/cells — at 100 TB the probe touches
  *     corpus/2^planes (resp. corpus/cells) bytes, not the corpus.
  *   - `probeSrp` / `probeIvf` read the materialized index and answer
  *     top-k; the corpus-side SRP signatures / cell assignments are
  *     NOT recomputed — that work was paid once at build time.
  *   - `ensureBuilt` makes a gate/caller build-if-missing exactly once
  *     per JVM (concurrent callers block on the same key), so several
  *     probe queries share one build — the probe-many contract.
  *
  * Partition-count note: `partitionBy` is the right layout while the
  * coarse key stays in the thousands (SRP planes ≤ ~12, IVF cells ≤
  * ~4096 — each partition dir must hold many row groups to be worth
  * pruning). Past that, switch to `Materialize.bucketedTable` on the
  * coarse key: same co-location, constant directory count, exchange-
  * free probe joins (BucketingSpec pins that plan shape).
  *
  * Determinism matches q31/q45 exactly — SRP planes from
  * [[Similarity.planeComponent]], IVF centroids = first `numCells`
  * vectors (a trained k-means would slot in identically), cosines via
  * the codegen'd sequential-fold [[Similarity.dot]] — so the DuckDB
  * oracles recompute the identical structure inline.
  */
object AnnIndex {

  // ── build-once / probe-many registry ──────────────────────────────
  // computeIfAbsent blocks concurrent callers on the same path, so the
  // first caller builds while the rest wait, then everyone probes one
  // materialized index. Keyed by path — callers embed the corpus
  // discriminator (e.g. the sf dir) in the path.
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Run `build` exactly once per JVM for `path`; later callers no-op
    * (or block until the in-flight build finishes). */
  def ensureBuilt(path: String)(build: => Unit): Unit =
    built.computeIfAbsent(path, _ => { build; java.lang.Boolean.TRUE })

  /** Test hook: forget a path so the next ensureBuilt rebuilds. */
  def invalidate(path: String): Unit = built.remove(path)

  // ── SRP-LSH index ──────────────────────────────────────────────────

  /** The SRP index frame: (id, vec, bucket). */
  def srpIndexFrame(vecs: DataFrame, idCol: String, vecCol: String,
      planes: Int, dim: Int): DataFrame =
    vecs.select(col(idCol).as("id"), col(vecCol).as("vec"),
      Similarity.srpBucket(col(vecCol), planes, dim).as("bucket"))

  /** Build-once: materialize the SRP index partitioned by bucket. */
  def buildSrp(vecs: DataFrame, idCol: String, vecCol: String,
      planes: Int, dim: Int, path: String): Unit =
    srpIndexFrame(vecs, idCol, vecCol, planes, dim)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Read a materialized index back. Partition-column values come back
    * via directory-name inference (int by default) — re-pin to long so
    * probe output schemas don't depend on the writer. */
  def readIndex(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val part = df.columns.intersect(Seq("bucket", "cell")).headOption
    part.fold(df)(c => df.withColumn(c, col(c).cast("long")))
  }

  /** Probe-many: top-k per query against a materialized SRP index.
    * Query signatures are computed on the (tiny, broadcast) query side
    * only; the equi-join on the PARTITION column `bucket` dynamic-
    * partition-prunes the index scan to the probed buckets. */
  def probeSrp(index: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int, dim: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      Similarity.srpBucket(col(vecCol), planes, dim).as("bucket"))
    val scored = index.join(broadcast(q), Seq("bucket"))
      .where(col("q_id") =!= col("id"))
      .select(col("q_id"), col("bucket"), col("id").as("n_id"),
        Similarity.cosine(col("q_vec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.select(col("q_id"), col("bucket"), col("n_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
  }

  /** Multi-probe SRP: probe the query's own bucket PLUS the `planes`
    * buckets at Hamming distance 1 (flip each sign bit) — the standard
    * recall knob for sign-LSH (a near neighbor that lands across one
    * hyperplane is recovered at (planes+1)× probe cost instead of
    * needing more tables). Buckets PARTITION the corpus, so the probed
    * candidate sets are disjoint — no dedup stage. The index scan is
    * still DPP-pruned: (planes+1)·|queries| bucket values reach the
    * pruning subquery instead of |queries|. */
  def probeSrpMultiProbe(index: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int,
      dim: Int): DataFrame = {
    val q0 = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      Similarity.srpBucket(col(vecCol), planes, dim).as("b0"))
    val q = q0
      .withColumn("__j", explode(expr(s"sequence(-1, ${planes - 1})")))
      .withColumn("bucket", when(col("__j") < 0, col("b0"))
        .otherwise(expr("b0 ^ cast(shiftleft(1, __j) as bigint)")))
      .select(col("q_id"), col("q_vec"), col("bucket"))
    val scored = index.join(broadcast(q), Seq("bucket"))
      .where(col("q_id") =!= col("id"))
      .select(col("q_id"), col("bucket"), col("id").as("n_id"),
        Similarity.cosine(col("q_vec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.select(col("q_id"), col("bucket"), col("n_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
  }

  // ── IVF index ──────────────────────────────────────────────────────

  /** Max-dot cell assignment against a (broadcast) centroid table with
    * columns (cid, cvec). */
  private def assign(df: DataFrame, cent: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val scored = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cent))
      .select(col("id"), col("v"), col("cid"),
        Similarity.dot(col("v"), col("cvec")).as("d"))
    val w = Window.partitionBy(col("id")).orderBy(col("d").desc, col("cid"))
    scored.select(col("id"), col("v"), col("cid"),
        row_number().over(w).as("__rn"))
      .where(col("__rn") === 1)
      .select(col("id"), col("v"), col("cid").as("cell"))
  }

  /** Build-once: centroid table + the corpus assigned to cells,
    * partitioned by cell. Centroids = the first `numCells` vectors by
    * id (deterministic; swap in trained centroids without changing the
    * layout). */
  def buildIvf(candidates: DataFrame, idCol: String, vecCol: String,
      numCells: Int, path: String): Unit = {
    val cent = candidates.where(col(idCol) < numCells)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    cent.write.mode("overwrite").parquet(s"$path/centroids")
    val centBack = candidates.sparkSession.read.parquet(s"$path/centroids")
    assign(candidates, centBack, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Probe-many: assign each query to its `nprobe` NEAREST cells via
    * the materialized centroids, then top-k across the probed cells —
    * the cells scan is DPP-pruned to the probed cells by the broadcast
    * equi-join. `nprobe = 1` is classic IVF; raising it is THE IVF
    * recall knob (probe cost grows as nprobe·corpus/cells). */
  def probeIvf(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    val cent = spark.read.parquet(s"$path/centroids")
    val cells = readIndex(spark, s"$path/cells")
    val qs = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cent))
      .select(col("id"), col("v"), col("cid"),
        Similarity.dot(col("v"), col("cvec")).as("d"))
    val wq = Window.partitionBy(col("id")).orderBy(col("d").desc, col("cid"))
    val q = qs.select(col("id"), col("v"), col("cid"),
        row_number().over(wq).as("__rn"))
      .where(col("__rn") <= nprobe)
      .select(col("id").as("q_id"), col("v").as("q_vec"),
        col("cid").as("cell"))
    val scored = cells.join(broadcast(q), Seq("cell"))
      .where(col("q_id") =!= col("id"))
      .select(col("q_id"), col("cell"), col("id").as("n_id"),
        Similarity.cosine(col("q_vec"), col("v")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.select(col("q_id"), col("cell"), col("n_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
  }
}
