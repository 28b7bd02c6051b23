package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.AnnIndex
import graft.sources.Tables

/** Materialized ANN index gates — the build-once / probe-many seam
  * (round-9 verdict item 3). q31/q45 prove the SRP/IVF math inline;
  * these four gates prove the PRODUCTION shape: the index is written
  * once as cell/bucket-partitioned parquet (the directory layout IS
  * the index), probes join on the partition column with a broadcast
  * query side so dynamic partition pruning reads only the probed
  * buckets, and `AnnIndex.ensureBuilt` lets the build and probe gates
  * share ONE materialized build per corpus per JVM. The DuckDB
  * oracles recompute the identical deterministic structure inline —
  * what's under test is that the materialize→read-back→probe path
  * returns byte-identical answers to the inline math.
  */
object AnnIndexQueries {

  // Sequential dot product CTE fragment (DuckDB) — identical op order
  // to Similarity.dot (float→double casts, left-to-right fold).
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1,65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x,y)->x+y)"

  // DuckDB SRP bucket CTE body for `planes` hyperplanes (q31's formula).
  private def srpSql(planes: Int): String =
    s"""CAST(list_sum(list_transform(range(0,$planes), j ->
          CASE WHEN list_reduce(list_transform(range(0,64), d ->
                 embedding[d+1]::DOUBLE * ((((j*97 + d*31) % 13) - 6)::DOUBLE / 6.0::DOUBLE)), (x,y)->x+y) > 0
               THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)"""

  /** Per-corpus scratch path: the sf dir is baked into the path so two
    * corpora never share (or overwrite) one index in the same JVM. */
  private def indexPath(kind: String, dir: String): String =
    java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_ann_${kind}_${dir.replaceAll("[^A-Za-z0-9]", "_")}").toString

  private val SrpPlanes = 6
  private val IvfCells = 12

  private def ensureSrp(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val path = indexPath("srp", dir)
    AnnIndex.ensureBuilt(path) {
      AnnIndex.buildSrp(Tables.embeddings(s, dir), "vec_id", "embedding",
        planes = SrpPlanes, dim = 64, path = path)
    }
    path
  }

  private def ensureIvf(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val path = indexPath("ivf", dir)
    AnnIndex.ensureBuilt(path) {
      AnnIndex.buildIvf(Tables.embeddings(s, dir), "vec_id", "embedding",
        numCells = IvfCells, path = path)
    }
    path
  }

  val defs: Seq[QueryDef] = Seq(

    // SRP index BUILD gate: materialize the 6-plane bucket-partitioned
    // index, read it back, and summarize per bucket (count + id
    // checksum + integral norm checksum over the ROUND-TRIPPED vectors
    // (floor'd to milli-units so the cross-row sum is order-free) — a
    // vector corrupted by the parquet round-trip shifts the checksum).
    // The oracle recomputes the bucket assignment inline: the gate
    // passes iff the materialized directory layout holds exactly the
    // rows the SRP math says it must.
    QueryDef(
      "q380_srp_index_build",
      (s, dir) => {
        val path = ensureSrp(s, dir)
        AnnIndex.readIndex(s, path)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_checksum"),
            sum(floor(graft.operators.Similarity.dot(col("vec"), col("vec"))
              * 1000).cast("long")).as("sq_norm_milli_sum"))
          .orderBy(col("bucket"))
      },
      Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, ${srpSql(SrpPlanes)} AS bucket
          FROM embeddings)
        SELECT bucket, COUNT(*) AS n_vecs,
               CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
               CAST(SUM(CAST(FLOOR(${dotSql("embedding", "embedding")} * 1000)
                 AS BIGINT)) AS BIGINT) AS sq_norm_milli_sum
        FROM b GROUP BY bucket
        ORDER BY bucket""")),

    // SRP index PROBE gate: top-3 neighbours for 10 query vectors
    // against the MATERIALIZED index (signatures computed only on the
    // broadcast query side; the index scan is DPP-pruned to the probed
    // buckets). Shares the q380 build via ensureBuilt — in one session
    // the build runs once and both gates ride it.
    QueryDef(
      "q381_srp_index_probe",
      (s, dir) => {
        val path = ensureSrp(s, dir)
        val q = Tables.embeddings(s, dir).where(col("vec_id") < 10)
        AnnIndex.probeSrp(AnnIndex.readIndex(s, path), q,
            "vec_id", "embedding", k = 3, planes = SrpPlanes, dim = 64)
          .select(col("q_id"), col("bucket"), col("n_id"), col("cos"),
            col("rnk").cast("long").as("rnk"))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, ${srpSql(SrpPlanes)} AS bucket
          FROM embeddings),
        q AS (SELECT vec_id q_id, embedding q_vec, bucket FROM b WHERE vec_id < 10),
        dots AS (
          SELECT q_id, q.bucket, c.vec_id n_id,
                 ${dotSql("q_vec", "c.embedding")}
                   / (sqrt(${dotSql("q_vec", "q_vec")}) * sqrt(${dotSql("c.embedding", "c.embedding")})) AS cos
          FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, bucket, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM dots)
        SELECT q_id, bucket, n_id, cos, rnk FROM ranked WHERE rnk <= 3
        ORDER BY q_id, rnk""")),

    // IVF index BUILD gate: materialize centroids (first 12 vectors)
    // plus the cell-partitioned assigned corpus, read back, summarize
    // per cell. Oracle recomputes the max-dot assignment inline.
    QueryDef(
      "q382_ivf_index_build",
      (s, dir) => {
        val path = ensureIvf(s, dir)
        AnnIndex.readIndex(s, s"$path/cells")
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("id")).as("id_checksum"),
            sum(floor(graft.operators.Similarity.dot(col("v"), col("v"))
              * 1000).cast("long")).as("sq_norm_milli_sum"))
          .orderBy(col("cell"))
      },
      Some(s"""
        WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $IvfCells),
        assign AS (
          SELECT vec_id, embedding, cid AS cell FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     ${dotSql("e.embedding", "c.cvec")} DESC, c.cid) AS rn
            FROM embeddings e, cent c) t WHERE rn = 1)
        SELECT CAST(cell AS BIGINT) AS cell, COUNT(*) AS n_vecs,
               CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
               CAST(SUM(CAST(FLOOR(${dotSql("embedding", "embedding")} * 1000)
                 AS BIGINT)) AS BIGINT) AS sq_norm_milli_sum
        FROM assign GROUP BY cell
        ORDER BY cell""")),

    // IVF index PROBE gate: queries are assigned via the MATERIALIZED
    // centroid table, then probe only their own cell in the
    // cell-partitioned corpus (DPP prunes the rest). Shares the q382
    // build via ensureBuilt.
    QueryDef(
      "q383_ivf_index_probe",
      (s, dir) => {
        val path = ensureIvf(s, dir)
        val q = Tables.embeddings(s, dir).where(col("vec_id") < 10)
        AnnIndex.probeIvf(s, path, q, "vec_id", "embedding", k = 3)
          .select(col("q_id"), col("cell"), col("n_id"), col("cos"),
            col("rnk").cast("long").as("rnk"))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(s"""
        WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $IvfCells),
        assign AS (
          SELECT vec_id, embedding, cid AS cell FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     ${dotSql("e.embedding", "c.cvec")} DESC, c.cid) AS rn
            FROM embeddings e, cent c) t WHERE rn = 1),
        q AS (SELECT vec_id q_id, embedding q_vec, cell FROM assign WHERE vec_id < 10),
        dots AS (
          SELECT q_id, q.cell, a.vec_id n_id,
                 ${dotSql("q_vec", "a.embedding")}
                   / (sqrt(${dotSql("q_vec", "q_vec")}) * sqrt(${dotSql("a.embedding", "a.embedding")})) AS cos
          FROM assign a JOIN q ON a.cell = q.cell AND a.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, cell, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM dots)
        SELECT q_id, CAST(cell AS BIGINT) AS cell, n_id, cos, rnk FROM ranked WHERE rnk <= 3
        ORDER BY q_id, rnk""")),

    // Multi-probe SRP: probe the query's own bucket plus all 6 buckets
    // at Hamming distance 1 (flip each sign bit) — the sign-LSH recall
    // knob. Buckets partition the corpus so probed candidate sets are
    // disjoint (no dedup stage); the index scan stays DPP-pruned, now
    // to (planes+1) buckets per query. Candidate pools strictly
    // contain q381's, so every q384 cosine at rank r is >= q381's at
    // rank r — the recall-vs-cost tradeoff made inspectable.
    QueryDef(
      "q384_srp_multiprobe",
      (s, dir) => {
        val path = ensureSrp(s, dir)
        val q = Tables.embeddings(s, dir).where(col("vec_id") < 10)
        AnnIndex.probeSrpMultiProbe(AnnIndex.readIndex(s, path), q,
            "vec_id", "embedding", k = 3, planes = SrpPlanes, dim = 64)
          .select(col("q_id"), col("bucket"), col("n_id"), col("cos"),
            col("rnk").cast("long").as("rnk"))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(s"""
        WITH b AS (
          SELECT vec_id, embedding, ${srpSql(SrpPlanes)} AS bucket
          FROM embeddings),
        q AS (SELECT vec_id q_id, embedding q_vec, bucket AS b0
              FROM b WHERE vec_id < 10),
        probes AS (
          SELECT q_id, q_vec,
                 CASE WHEN u.j < 0 THEN b0
                      ELSE xor(b0, (1::BIGINT << CAST(u.j AS INT))) END AS bucket
          FROM q, unnest(range(-1, $SrpPlanes)) AS u(j)),
        dots AS (
          SELECT p.q_id, p.bucket, c.vec_id n_id,
                 ${dotSql("p.q_vec", "c.embedding")}
                   / (sqrt(${dotSql("p.q_vec", "p.q_vec")}) * sqrt(${dotSql("c.embedding", "c.embedding")})) AS cos
          FROM b c JOIN probes p ON c.bucket = p.bucket AND c.vec_id <> p.q_id),
        ranked AS (
          SELECT q_id, bucket, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM dots)
        SELECT q_id, bucket, n_id, cos, rnk FROM ranked WHERE rnk <= 3
        ORDER BY q_id, rnk""")),

    // IVF nprobe=2: each query probes its TWO nearest cells instead of
    // one — the IVF recall knob (probe cost 2·corpus/cells). Shares the
    // q382 build; the cells scan is DPP-pruned to the probed cells.
    QueryDef(
      "q385_ivf_nprobe2",
      (s, dir) => {
        val path = ensureIvf(s, dir)
        val q = Tables.embeddings(s, dir).where(col("vec_id") < 10)
        AnnIndex.probeIvf(s, path, q, "vec_id", "embedding", k = 3,
            nprobe = 2)
          .select(col("q_id"), col("cell"), col("n_id"), col("cos"),
            col("rnk").cast("long").as("rnk"))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(s"""
        WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $IvfCells),
        assign AS (
          SELECT vec_id, embedding, cid AS cell FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     ${dotSql("e.embedding", "c.cvec")} DESC, c.cid) AS rn
            FROM embeddings e, cent c) t WHERE rn = 1),
        q AS (
          SELECT vec_id q_id, embedding q_vec, cid AS cell FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     ${dotSql("e.embedding", "c.cvec")} DESC, c.cid) AS rn
            FROM embeddings e, cent c WHERE e.vec_id < 10) t WHERE rn <= 2),
        dots AS (
          SELECT q_id, q.cell, a.vec_id n_id,
                 ${dotSql("q_vec", "a.embedding")}
                   / (sqrt(${dotSql("q_vec", "q_vec")}) * sqrt(${dotSql("a.embedding", "a.embedding")})) AS cos
          FROM assign a JOIN q ON a.cell = q.cell AND a.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, cell, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM dots)
        SELECT q_id, CAST(cell AS BIGINT) AS cell, n_id, cos, rnk FROM ranked WHERE rnk <= 3
        ORDER BY q_id, rnk""")))
}
