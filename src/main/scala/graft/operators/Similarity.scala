package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `Array[Float]` columns: brute-force
  * cosine top-k (the exact baseline) and a sign-LSH bucketed variant (the
  * scale path — candidates only within a bucket, never all-pairs).
  *
  * Determinism: all arithmetic is float→double casts followed by a
  * left-to-right sequential double fold — the same op order DuckDB's
  * `list_reduce(list_transform(..))` produces, so cosines are
  * bit-identical across engines and safe to hash-compare.
  *
  * Scale design: brute-force is a broadcast of the (small) query set
  * against a partitioned candidate scan — no shuffle of the big side; the
  * per-query top-k window is a partial top-k under AQE. The LSH variant
  * buckets both sides first (8-D sign sketch → 256 buckets), shuffling
  * only on bucket id, so a 1000-executor run probes ~1/256 of the corpus
  * per query at equal recall-per-probe tradeoffs (classic SRP-LSH).
  */
object Similarity {

  /** Sequential dot product: Σ a_i·b_i with double casts, left-to-right
    * (init 0.0 — identical fold to DuckDB list_reduce since 0.0+x == x).
    * Native codegen'd expression; the HOF `aggregate(zip_with(..))` form
    * is interpreted per element and was ~10× slower on pairwise queries. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.VectorDot(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k neighbours for each query vector by brute-force cosine.
    * `queries`/`candidates` carry (idCol, vecCol); queries are broadcast. */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = candidates.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_vec"), col("n_vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.select(col("q_id"), col("n_id"), col("cos"), row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component (j-th plane, d-th
    * dim) — pure integer arithmetic then one exact double division, so the
    * oracle regenerates the identical plane without literal tables (the
    * JVM computes the same IEEE value the SQL formula does). */
  def planeComponent(j: Int, d: Int): Double =
    (((j * 97 + d * 31) % 13) - 6) / 6.0d

  /** Signed-random-projection bucket id: bit j = sign(v · plane_j), with
    * planes materialized as literal arrays so the projections run through
    * the codegen'd VectorDot. */
  def srpBucket(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { j =>
      val plane = array((0 until dim).map(d => lit(planeComponent(j, d))): _*)
      when(dot(vec, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style cell-probed ANN: a coarse quantizer (here: the first
    * `numCells` vectors as deterministic centroids — a trained k-means
    * would slot in identically) assigns every vector to its max-dot
    * cell; queries probe only their own cell. Assignment is a broadcast
    * of the tiny centroid set against the corpus scan + a rank window —
    * O(N·cells) map-side work, one shuffle; probing is an equi-join on
    * cell. The standard inverted-file layout: probe cost = corpus/cells
    * per query, recall tunable by probing neighbor cells. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, numCells: Int): DataFrame = {
    val cent = candidates.where(col(idCol) < numCells)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    def assign(df: DataFrame): DataFrame = {
      val scored = df.select(col(idCol).as("id"), col(vecCol).as("v"))
        .crossJoin(broadcast(cent))
        .select(col("id"), col("v"), col("cid"), dot(col("v"), col("cvec")).as("d"))
      val w = Window.partitionBy(col("id")).orderBy(col("d").desc, col("cid"))
      scored.select(col("id"), col("v"), col("cid"),
          row_number().over(w).as("__rn"))
        .where(col("__rn") === 1)
        .select(col("id"), col("v"), col("cid").as("cell"))
    }
    val assigned = assign(candidates)
    val q = assign(queries)
      .select(col("id").as("q_id"), col("v").as("q_vec"), col("cell"))
    val scored = assigned.join(broadcast(q), Seq("cell"))
      .where(col("q_id") =!= col("id"))
      .select(col("q_id"), col("cell"), col("id").as("n_id"),
        cosine(col("q_vec"), col("v")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.select(col("q_id"), col("cell"), col("n_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
  }

  /** Occupancy-driven SRP plane count: ceil(log2(n / targetOccupancy)),
    * clamped to [4, 20]. A FIXED plane count goes quadratic as the corpus
    * grows (bucket occupancy rises linearly with n, in-bucket cost with
    * n²/2^planes — the round-4 tri-scale sweep measured alpha 1.69 at 4
    * planes); deriving planes from n keeps expected occupancy, and thus
    * per-bucket pair cost, constant at any scale. Matches the oracle's
    * `ceil(log2(greatest(1, count(*) // target)))` exactly: the bit-twiddle
    * below IS ceil-log2, and IEEE log2 is exact on powers of two. */
  def autoPlanes(n: Long, targetOccupancy: Long = 64L): Int = {
    val buckets = math.max(1L, n / targetOccupancy)
    val ceilLog2 =
      if (buckets <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1L)
    math.max(4, math.min(20, ceilLog2))
  }

  /** Embedding-cosine near-duplicate pairs: SRP-bucket blocking (same
    * bucket only — never all-pairs), exact cosine inside the bucket,
    * threshold filter. LSH recall is partial by construction; raise
    * `planes` for precision, add band rotations for recall. */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, planes: Int, dim: Int): DataFrame = {
    val b = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      srpBucket(col(vecCol), planes, dim).as("bucket"))
    val a = b.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val c = b.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(c, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= minCosine)
  }

  /** ANN top-k: candidates share the query's SRP bucket; exact cosine is
    * computed only inside the bucket. Equi-join on bucket → one hash
    * shuffle on a low-cardinality key; AQE splits hot buckets. */
  def lshTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int, dim: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      srpBucket(col(vecCol), planes, dim).as("bucket"))
    val c = candidates.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      srpBucket(col(vecCol), planes, dim).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("bucket"), col("n_id"),
        cosine(col("q_vec"), col("n_vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.select(col("q_id"), col("bucket"), col("n_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .where(col("rnk") <= k)
  }
}
