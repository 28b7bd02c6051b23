package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Embedding similarity search over `embeddings` (FLOAT[64]) and the
  * multimodal binary-column surface. Cosines are sequential double folds
  * on both engines, so results hash-compare bit-for-bit.
  */
object VectorQueries {

  // Sequential dot product CTE fragment (DuckDB): identical op order to
  // Similarity.dot (float→double casts, left-to-right fold).
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1,65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x,y)->x+y)"

  // 16-dim prefix twin (q253 matryoshka audit) — same fold order.
  private def dotSql16(a: String, b: String): String =
    s"list_reduce(list_transform(range(1,17), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x,y)->x+y)"

  val defs: Seq[QueryDef] = Seq(

    // Hard-negative mining for contrastive/embedding training — per
    // anchor, the top-3 MOST-similar candidates from a DIFFERENT class
    // (the negatives that actually move a contrastive loss; easy
    // negatives are uninformative). Same exact-cosine machinery as q30
    // (native codegen'd VectorDot, broadcast anchor set) plus the
    // cross-label exclusion predicate pushed into the pair scan — the
    // filter runs before any ranking, so excluded same-label pairs
    // never reach the window. 100 TB: swap the brute-force pair scan
    // for the q31/q45 bucketed paths unchanged; the exclusion predicate
    // rides the candidate scan either way.
    QueryDef(
      "q241_hard_negatives",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label").as("q_label"))
        val cand = e.select(col("vec_id").as("n_id"),
          col("embedding").as("n_vec"), col("label").as("n_label"))
        val scored = cand.crossJoin(broadcast(q))
          .where(col("n_label") =!= col("q_label"))
          .select(col("q_id"), col("n_id"),
            col("n_label").cast("long").as("n_label"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .where(col("rnk") <= 3)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(s"""
        WITH q AS (
          SELECT vec_id q_id, embedding q_vec, label q_label
          FROM embeddings WHERE vec_id < 10),
        dots AS (
          SELECT q_id, e.vec_id n_id, CAST(e.label AS BIGINT) n_label,
                 ${dotSql("q_vec", "e.embedding")}
                   / (sqrt(${dotSql("q_vec", "q_vec")}) * sqrt(${dotSql("e.embedding", "e.embedding")})) AS cos
          FROM embeddings e, q WHERE e.label <> q.q_label),
        ranked AS (
          SELECT q_id, n_id, n_label, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM dots)
        SELECT q_id, n_id, n_label, cos, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 3
        ORDER BY q_id, rnk""")),

    // Matryoshka truncation audit — how much retrieval quality survives
    // when only the first 16 of 64 embedding dims are used (the
    // MRL-style serve-cheap/rerank-precise tradeoff): per anchor,
    // top-5 by FULL-dim cosine vs top-5 by PREFIX-dim cosine,
    // recall = overlap/5 emitted as exact permille plus both neighbor
    // checksums so a single swapped neighbor is visible. Both passes
    // ride the q30 brute-force contract (codegen'd VectorDot, broadcast
    // anchors, identical fold order in the oracle); the prefix pass
    // dots 4× fewer components — the audit itself demonstrates the
    // serving saving. Scale: two bounded-anchor passes + one
    // 5-row-per-anchor join; swap in the bucketed ANN paths unchanged.
    QueryDef(
      "q253_matryoshka_recall",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val full = Similarity.bruteForceTopK(
            e.where(col("vec_id") < 10), e, "vec_id", "embedding", 5)
          .select(col("q_id"), col("n_id").as("fn"))
          .cutLineage()
        val pre = e.select(col("vec_id"),
          slice(col("embedding"), 1, 16).as("embedding"))
        val prefix = Similarity.bruteForceTopK(
            pre.where(col("vec_id") < 10), pre, "vec_id", "embedding", 5)
          .select(col("q_id").as("q2"), col("n_id").as("pn"))
          .cutLineage()
        val fAgg = full.groupBy(col("q_id"))
          .agg(sum(col("fn")).as("full_checksum"))
        val pAgg = prefix.groupBy(col("q2").as("q_id"))
          .agg(sum(col("pn")).as("prefix_checksum"))
        val iAgg = full.join(prefix,
            full("q_id") === prefix("q2") && col("fn") === col("pn"))
          .groupBy(full("q_id")).agg(count(lit(1)).as("n_common"))
        fAgg.join(pAgg, "q_id").join(iAgg, Seq("q_id"), "left")
          .select(col("q_id"),
            coalesce(col("n_common"), lit(0L)).as("n_common"),
            (coalesce(col("n_common"), lit(0L)) * 200L).as("recall_permille"),
            col("full_checksum"), col("prefix_checksum"))
          .orderBy(col("q_id"))
      },
      Some(s"""
        WITH q AS (SELECT vec_id q_id, embedding q_vec FROM embeddings WHERE vec_id < 10),
        fdots AS (
          SELECT q_id, e.vec_id n_id,
                 ${dotSql("q_vec", "e.embedding")}
                   / (sqrt(${dotSql("q_vec", "q_vec")}) * sqrt(${dotSql("e.embedding", "e.embedding")})) AS cos
          FROM embeddings e, q WHERE e.vec_id <> q_id),
        franked AS (
          SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM fdots),
        ftop AS (SELECT q_id, n_id FROM franked WHERE rnk <= 5),
        pdots AS (
          SELECT q_id, e.vec_id n_id,
                 ${dotSql16("q_vec", "e.embedding")}
                   / (sqrt(${dotSql16("q_vec", "q_vec")}) * sqrt(${dotSql16("e.embedding", "e.embedding")})) AS cos
          FROM embeddings e, q WHERE e.vec_id <> q_id),
        pranked AS (
          SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM pdots),
        ptop AS (SELECT q_id, n_id FROM pranked WHERE rnk <= 5),
        inter AS (
          SELECT f.q_id, COUNT(*) AS n_common
          FROM ftop f JOIN ptop p ON f.q_id = p.q_id AND f.n_id = p.n_id
          GROUP BY 1)
        SELECT f.q_id,
               CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
               CAST(COALESCE(i.n_common, 0) * 200 AS BIGINT) AS recall_permille,
               CAST(f.cs AS BIGINT) AS full_checksum,
               CAST(p.cs AS BIGINT) AS prefix_checksum
        FROM (SELECT q_id, SUM(n_id) cs FROM ftop GROUP BY 1) f
        JOIN (SELECT q_id, SUM(n_id) cs FROM ptop GROUP BY 1) p USING (q_id)
        LEFT JOIN inter i USING (q_id)
        ORDER BY f.q_id""")),

    // Brute-force exact cosine top-k: the ANN baseline. Query set (10
    // vectors) broadcast against the candidate scan; per-query top-k via
    // rank window.
    QueryDef(
      "q30_knn_cosine",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.where(col("vec_id") < 10)
        Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
          .select(col("q_id"), col("n_id"), col("cos"), col("rnk").cast("long").as("rnk"))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(s"""
        WITH q AS (SELECT vec_id q_id, embedding q_vec FROM embeddings WHERE vec_id < 10),
        dots AS (
          SELECT q_id, e.vec_id n_id,
                 ${dotSql("q_vec", "e.embedding")}
                   / (sqrt(${dotSql("q_vec", "q_vec")}) * sqrt(${dotSql("e.embedding", "e.embedding")})) AS cos
          FROM embeddings e, q WHERE e.vec_id <> q_id),
        ranked AS (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM dots)
        SELECT q_id, n_id, cos, rnk FROM ranked WHERE rnk <= 5
        ORDER BY q_id, rnk""")),

    // Signed-random-projection LSH ANN: 4 deterministic hyperplanes → 16
    // buckets; exact cosine only inside the query's bucket (the scale
    // path — probes ~1/16 of the corpus per query).
    QueryDef(
      "q31_ann_lsh",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.where(col("vec_id") < 10)
        Similarity.lshTopK(q, e, "vec_id", "embedding", 3, planes = 4, dim = 64)
          .select(col("q_id"), col("bucket"), col("n_id"), col("cos"),
            col("rnk").cast("long").as("rnk"))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(s"""
        WITH b AS (
          SELECT vec_id, embedding,
                 CAST(list_sum(list_transform(range(0,4), j ->
                   CASE WHEN list_reduce(list_transform(range(0,64), d ->
                          embedding[d+1]::DOUBLE * ((((j*97 + d*31) % 13) - 6)::DOUBLE / 6.0::DOUBLE)), (x,y)->x+y) > 0
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
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

    // Embedding-cosine near-duplicate detection: SRP-bucket blocking +
    // exact cosine + threshold — the embedding flavor of the dedup
    // family (LSH recall is partial by construction; both engines apply
    // the identical blocking so results hash-match). Plane count is THE
    // scale knob and is now OCCUPANCY-DRIVEN on both engines:
    // ceil(log2(n/64)) clamped to [4,20] (Similarity.autoPlanes), so
    // expected bucket occupancy — and with it the in-bucket Σbucket²
    // pair cost — stays constant as the corpus grows. The round-4
    // tri-scale sweep measured a FIXED 4-plane count at alpha 1.69
    // (quadratic); a fixed 8 was fine at sf1 but only deferred the
    // blow-up. The one driver-side action is a metadata-only count(*).
    QueryDef(
      "q41_embed_neardup",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val planes = Similarity.autoPlanes(e.count(), targetOccupancy = 64L)
        Similarity.nearDupPairs(e, "vec_id", "embedding",
            minCosine = 0.4, planes = planes, dim = 64)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH p AS (
          SELECT GREATEST(4, LEAST(20, CAST(ceil(log2(GREATEST(1,
                   (SELECT COUNT(*) FROM embeddings) // 64))) AS INT))) AS np),
        b AS (
          SELECT vec_id, embedding,
                 CAST(list_sum(list_transform(range(0,(SELECT np FROM p)), j ->
                   CASE WHEN list_reduce(list_transform(range(0,64), d ->
                          embedding[d+1]::DOUBLE * ((((j*97 + d*31) % 13) - 6)::DOUBLE / 6.0::DOUBLE)), (x,y)->x+y) > 0
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
          FROM embeddings),
        pairs AS (
          SELECT a.vec_id id_a, c.vec_id id_b,
                 ${dotSql("a.embedding", "c.embedding")}
                   / (sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("c.embedding", "c.embedding")})) AS cos
          FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
        SELECT id_a, id_b, cos FROM pairs
        WHERE cos >= 0.4::DOUBLE
        ORDER BY id_a, id_b""")),

    // Multimodal binary plumbing: payload as opaque binary + typed
    // metadata, column-level feature extraction (size / head signature /
    // sampled-byte checksum). The mapPartitions decode stub is exercised
    // in unit tests; this query is the oracle-checkable column surface.
    QueryDef(
      "q32_multimodal_features",
      (s, dir) => {
        val media = Multimodal.fromDocuments(Tables.documents(s, dir))
        media.select(
            Seq(col("media_id"), col("media_type"), col("width").cast("long").as("width"),
              col("height").cast("long").as("height"),
              col("n_frames").cast("long").as("n_frames")) ++
              Multimodal.fakeFeatures(col("content"), Seq(1, 5, 9, 13)): _*)
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT doc_id AS media_id,
               'image/fake' AS media_type,
               (n_chars % 640 + 64) AS width,
               ((n_chars * 7) % 480 + 48) AS height,
               (n_chars % 16 + 1) AS n_frames,
               octet_length(encode(text)) AS n_bytes,
               to_base64(encode(substring(text, 1, 16))) AS head_b64,
               CAST(ascii(substring(text,1,1)) + ascii(substring(text,5,1))
                + ascii(substring(text,9,1)) + ascii(substring(text,13,1)) AS BIGINT) AS sample_checksum
        FROM documents
        ORDER BY media_id""")),

    // The REAL audio codec gated end-to-end: Spark builds genuine
    // PCM-16 WAV binaries from a deterministic sample formula, runs them
    // through WavCodec.encode → decodeFrames (RIFF parse, windowed peak
    // amplitudes, byte offsets), while the oracle predicts the peaks
    // straight from the formula — any header-layout, endianness or
    // window-bound defect in the codec hash-fails the gate. Payloads
    // stay opaque binary on executors; one codec dispatch per partition.
    QueryDef(
      "q86_wav_roundtrip",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Multimodal.{MediaRow, WavCodec}
        val media = Tables.documents(s, dir)
          .select(col("doc_id"), ((col("n_chars") % 50) + 8).cast("int").as("n"))
          .as[(Long, Int)]
          .map { case (id, n) =>
            val samples = Array.tabulate(n)(i =>
              ((id * 31 + i * 131) % 65536 - 32768).toShort)
            MediaRow(id, "audio/wav",
              WavCodec.encode(WavCodec.Audio(1, 8000, samples, 0)), 0, 0, 4)
          }
        Multimodal.decodeFrames(media)(s)
          .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("byte_offset"), col("sample_value").cast("long").as("peak"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""
        WITH d AS (SELECT doc_id, (n_chars % 50) + 8 AS n FROM documents),
        idx AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        smp AS (SELECT doc_id, n, i,
                       ((doc_id * 31 + i * 131) % 65536) - 32768 AS v FROM idx),
        frames AS (SELECT doc_id, n, unnest(range(0, 4)) AS f FROM d)
        SELECT fr.doc_id AS media_id,
               CAST(fr.f AS BIGINT) AS frame_idx,
               CAST(44 + 2 * ((fr.f * fr.n) // 4) AS BIGINT) AS byte_offset,
               CAST(MAX(abs(s.v)) AS BIGINT) AS peak
        FROM frames fr JOIN smp s
          ON s.doc_id = fr.doc_id
         AND s.i >= (fr.f * fr.n) // 4
         AND s.i < ((fr.f + 1) * fr.n) // 4
        GROUP BY fr.doc_id, fr.f, fr.n
        ORDER BY media_id, frame_idx""")),

    // Fixed-point k-means (k=4, two Lloyd rounds): coordinates quantize
    // ONCE to BIGINT micro-units (floor(x·10⁶) — the only float touch),
    // and every downstream op — squared distances, argmin, centroid
    // means — is integer arithmetic (the one division is a <2⁵³ double
    // floor-div, IEEE-exact on both engines). That makes a fixed
    // iteration count bit-reproducible at any parallelism: no float
    // summation order, no tie ambiguity (argmin breaks on centroid id).
    // Shape per round: broadcast the k×64 centroid table onto the
    // exploded coordinate stream (fan-out k), partial-agg the distance
    // sums on vec_id, window-argmin, then one partial agg for the new
    // centroids — two exchanges per round, both on the vector key, the
    // Pregel rhythm again. Seeds are the first k vec_ids (the
    // deterministic-init contract; k-means++ would randomize).
    QueryDef(
      "q114_kmeans_fixedpoint",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        import org.apache.spark.sql.expressions.Window
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("vec_id"), col("dim").cast("long").as("dim"),
            floor(col("xf").cast("double") * lit(1000000.0d)).cast("long").as("xq"))
        val c0 = ex.where(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("dim"), col("xq").as("cq"))

        def assign(cent: DataFrame): DataFrame = {
          val d2 = ex.join(broadcast(cent), Seq("dim"))
            .groupBy(col("vec_id"), col("cid"))
            .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
          val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
          d2.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
            .select(col("vec_id"), col("cid"))
        }
        def update(asg: DataFrame): DataFrame =
          ex.join(asg, Seq("vec_id"))
            .groupBy(col("cid"), col("dim"))
            .agg(floor(sum(col("xq")).cast("double") / count(lit(1)))
              .cast("long").as("cq"))

        val c1 = update(assign(c0))
        val a2 = assign(c1)
        val c2 = update(a2)
        val stats = a2.groupBy(col("cid"))
          .agg(count(lit(1)).as("n_vectors"), sum(col("vec_id")).as("id_checksum"))
        val cstats = c2.groupBy(col("cid"))
          .agg(sum(abs(col("cq"))).as("centroid_l1"))
        stats.join(cstats, Seq("cid")).orderBy(col("cid"))
      },
      Some("""
        WITH ex AS (
          SELECT vec_id, unnest(range(len(embedding))) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * CAST(1000000 AS DOUBLE)) AS BIGINT) AS xq
          FROM embeddings),
        c0 AS (SELECT vec_id AS cid, dim, xq AS cq FROM ex WHERE vec_id < 4),
        d1 AS (SELECT e.vec_id, c.cid,
                      SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
               FROM ex e JOIN c0 c USING (dim) GROUP BY 1, 2),
        a1 AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                 FROM d1) WHERE rn = 1),
        c1 AS (SELECT a.cid, e.dim,
                      CAST(floor(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
               FROM ex e JOIN a1 a USING (vec_id) GROUP BY 1, 2),
        d2_ AS (SELECT e.vec_id, c.cid,
                       SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
                FROM ex e JOIN c1 c USING (dim) GROUP BY 1, 2),
        a2 AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                 FROM d2_) WHERE rn = 1),
        c2 AS (SELECT a.cid, e.dim,
                      CAST(floor(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
               FROM ex e JOIN a2 a USING (vec_id) GROUP BY 1, 2),
        stats AS (SELECT cid, COUNT(*) AS n_vectors,
                         CAST(SUM(vec_id) AS BIGINT) AS id_checksum
                  FROM a2 GROUP BY 1),
        cstats AS (SELECT cid, CAST(SUM(abs(cq)) AS BIGINT) AS centroid_l1
                   FROM c2 GROUP BY 1)
        SELECT s.cid, s.n_vectors, s.id_checksum, c.centroid_l1
        FROM stats s JOIN cstats c USING (cid)
        ORDER BY s.cid""")),

    // Johnson-Lindenstrauss random-projection audit: project the 64-d
    // embeddings to 16-d with the deterministic rational planes the SRP
    // family already uses, then measure distance preservation on a
    // bounded probe set (vec_id < 50 -> 1225 pairs, an exact tiny
    // baseline like q30). Ratio = proj_d2 / (true_d2 * 16 * E[c^2]) in
    // floor-permille, where E[c^2] = 14/36 is the exact second moment of
    // the plane components ((k-6)/6, k uniform over 13 residues) — so
    // 1000 means perfectly preserved. min/max/avg/median permille are
    // pinned exactly; the quality BOUND gates the median (k=16 makes
    // per-pair tails wide — near-identical pairs have tiny true
    // distances and unstable ratios — but the median is the committed
    // estimate). At 100 TB the projection is the map-side shrink that
    // makes downstream ANN 4x cheaper per probe; the audit is how you
    // validate the shrink before committing a corpus rewrite to it.
    QueryDef(
      "q158_jl_projection_audit",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).where(col("vec_id") < 50)
        val proj = array((0 until 16).map { j =>
          Similarity.dot(col("embedding"),
            array((0 until 64).map(d => lit(Similarity.planeComponent(j, d))): _*))
        }: _*)
        val p = e.select(col("vec_id"), col("embedding"), proj.as("pr"))
        val a = p.select(col("vec_id").as("id_a"), col("embedding").as("va"),
          col("pr").as("pa"))
        val b = p.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
          col("pr").as("pb"))
        // 50x50 crossJoin: documented exact tiny probe set, like q30
        val pairs = a.crossJoin(b).where(col("id_a") < col("id_b"))
          .select(
            expr("aggregate(zip_with(va, vb, (x, y) -> " +
              "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
              "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0.0D, (acc, v) -> acc + v)")
              .as("true_d2"),
            expr("aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)), " +
              "0.0D, (acc, v) -> acc + v)").as("proj_d2"))
          .where(col("true_d2") > 0)
          .select(floor(lit(9000.0) * col("proj_d2") /
            (lit(56.0) * col("true_d2"))).as("pm"))
        pairs.agg(count(lit(1)).as("n_pairs"),
            min(col("pm")).as("min_pm"), max(col("pm")).as("max_pm"),
            expr("CAST(sum(pm) DIV count(1) AS BIGINT)").as("avg_pm"),
            expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY pm) AS BIGINT)")
              .as("med_pm"))
          .withColumn("is_bounded",
            col("med_pm") >= 600 && col("med_pm") <= 1800)
          .orderBy(col("n_pairs"))
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
        p AS (
          SELECT vec_id, embedding,
                 list_transform(range(0,16), j ->
                   list_reduce(list_transform(range(0,64), d ->
                     embedding[d+1]::DOUBLE * ((((j*97 + d*31) % 13) - 6)::DOUBLE / 6.0::DOUBLE)), (x,y)->x+y)) AS pr
          FROM e),
        pairs AS (
          SELECT
            list_reduce(list_transform(range(1,65), i ->
              (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
              * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)), (x,y)->x+y) AS true_d2,
            list_reduce(list_transform(range(1,17), i ->
              (a.pr[i] - b.pr[i]) * (a.pr[i] - b.pr[i])), (x,y)->x+y) AS proj_d2
          FROM p a JOIN p b ON a.vec_id < b.vec_id),
        pm AS (
          SELECT CAST(floor((9000.0 * proj_d2) / (56.0 * true_d2)) AS BIGINT) AS pm
          FROM pairs WHERE true_d2 > 0)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(pm) AS BIGINT) AS min_pm,
               CAST(MAX(pm) AS BIGINT) AS max_pm,
               CAST(SUM(pm) // COUNT(*) AS BIGINT) AS avg_pm,
               CAST(quantile_disc(pm, 0.5) AS BIGINT) AS med_pm,
               (quantile_disc(pm, 0.5) BETWEEN 600 AND 1800) AS is_bounded
        FROM pm
        ORDER BY n_pairs""")),

    // One-pass covariance (Gram) matrix of the embedding columns — the
    // d×d statistic PCA/whitening/drift-detection pipelines need from an
    // n×d corpus. Inputs are quantized to exact int64 micro-units
    // (round(x·10⁶)), so Σxᵢ, Σxᵢxⱼ are order-free integer sums; the
    // population covariance combines them in DECIMAL(38,0) (n·Σxy
    // overflows int64 past ~10⁵ rows) with ONE double division at the
    // end. Per row the d(d+1)/2 upper-triangle products are generated by
    // a per-row nested transform+flatten (no self-join); partial
    // aggregation means the shuffle carries ≤2080 rows per map partition
    // regardless of n — the canonical "wide statistic from tall data"
    // map-combine shape, linear to 100 TB.
    QueryDef(
      "q204_embedding_covariance",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        // same fan-out rationale as q348: 2080 pair products per row on
        // an under-split scan
        val q = graft.operators.Skew.fanOutRead(e.select(col("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double").cast("decimal(18,6)") * 1000000).cast("long")).as("v")))
        val d = 64
        val pairRows = q.select(explode(flatten(
            transform(sequence(lit(1), lit(d)), i =>
              transform(sequence(i, lit(d)), j =>
                struct(i.as("i"), j.as("j"),
                  (element_at(col("v"), i) * element_at(col("v"), j)).as("xy"))))))
            .as("p"))
          .select(col("p.i").cast("long").as("i"), col("p.j").cast("long").as("j"),
            col("p.xy").as("xy"))
        val sums = pairRows.groupBy(col("i"), col("j"))
          .agg(count(lit(1)).as("n"), sum(col("xy")).as("sxy"))
        val dims = q.select(posexplode(col("v")).as(Seq("i0", "x")))
          .select((col("i0") + 1).cast("long").as("i"), col("x"))
          .groupBy(col("i")).agg(sum(col("x")).as("sx"))
        val di = dims.select(col("i"), col("sx").as("sxi"))
        val dj = dims.select(col("i").as("j"), col("sx").as("sxj"))
        sums.join(broadcast(di), Seq("i")).join(broadcast(dj), Seq("j"))
          .select(col("i"), col("j"), col("n"),
            ((col("n").cast("decimal(38,0)") * col("sxy").cast("decimal(38,0)") -
              col("sxi").cast("decimal(38,0)") * col("sxj").cast("decimal(38,0)"))
              .cast("double") /
              (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)"))
                .cast("double") / 1.0e12).as("cov"))
          .orderBy(col("i"), col("j"))
      },
      Some("""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(CAST(x::DOUBLE AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS v
          FROM embeddings),
        ij AS (
          SELECT i.i AS i, j.j AS j
          FROM (SELECT unnest(range(1, 65)) AS i) i,
               (SELECT unnest(range(1, 65)) AS j) j
          WHERE j.j >= i.i),
        sums AS (
          SELECT ij.i, ij.j,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q.v[ij.i] * q.v[ij.j]) AS BIGINT) AS sxy
          FROM q, ij
          GROUP BY 1, 2),
        dims AS (
          SELECT d.i, CAST(SUM(q.v[d.i]) AS BIGINT) AS sx
          FROM q, (SELECT unnest(range(1, 65)) AS i) d
          GROUP BY 1)
        SELECT s.i, s.j, s.n,
               (CAST(s.n AS DECIMAL(38,0)) * CAST(s.sxy AS DECIMAL(38,0))
                  - CAST(di.sx AS DECIMAL(38,0)) * CAST(dj.sx AS DECIMAL(38,0)))::DOUBLE
                 / (CAST(s.n AS DECIMAL(38,0)) * CAST(s.n AS DECIMAL(38,0)))::DOUBLE
                 / 1.0e12 AS cov
        FROM sums s
        JOIN dims di ON di.i = s.i
        JOIN dims dj ON dj.i = s.j
        ORDER BY s.i, s.j""")),

    // Energy-based voice-activity segmentation over REAL decoded PCM —
    // the q86 WAV codec driven one level deeper: per-clip 8-sample
    // windows with exact integer energy Σv² (no float anywhere), a
    // fixed activity threshold, and adjacent active windows merged into
    // segments via the islands trick (win_idx − row_number). The
    // synthesis formula is the oracle's window-algebra twin, so any
    // codec defect (header offset, endianness, window bounds) or
    // segmentation defect hash-fails. Scale: the codec runs
    // mapPartitions (one dispatch per partition, payloads never leave
    // the executor); windows/doc are bounded, the islands window
    // partitions per clip — everything linear in total audio bytes.
    QueryDef(
      "q212_audio_vad",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Multimodal.{MediaRow, WavCodec}
        val media = Tables.documents(s, dir)
          .select(col("doc_id"), ((col("n_chars") % 50) + 8).cast("int").as("n"))
          .as[(Long, Int)]
          .map { case (id, n) =>
            val samples = Array.tabulate(n)(i =>
              ((id * 31 + i * 131) % 65536 - 32768).toShort)
            MediaRow(id, "audio/wav",
              WavCodec.encode(WavCodec.Audio(1, 8000, samples, 0)), 0, 0, 0)
          }
        val wins = Multimodal.decodeEnergyWindows(media, 8)(s).toDF()
          .select(col("media_id"), col("win_idx"), col("energy"))
        val perClip = wins.groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_windows"),
            sum(when(col("energy") > 2800000000L, 1L).otherwise(0L)).as("n_active"))
        val active = wins.where(col("energy") > 2800000000L)
        val w = Window.partitionBy(col("media_id")).orderBy(col("win_idx"))
        val segs = active
          .withColumn("sid", col("win_idx") - row_number().over(w))
          .groupBy(col("media_id"), col("sid"))
          .agg(count(lit(1)).as("seg_len"))
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_segments"), max(col("seg_len")).as("max_seg_len"))
        perClip.join(segs, Seq("media_id"), "left")
          .select(col("media_id"), col("n_windows"), col("n_active"),
            coalesce(col("n_segments"), lit(0L)).as("n_segments"),
            coalesce(col("max_seg_len"), lit(0L)).as("max_seg_len"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH d AS (SELECT doc_id, (n_chars % 50) + 8 AS n FROM documents),
        smp AS (
          SELECT doc_id, i // 8 AS win_idx,
                 ((doc_id * 31 + i * 131) % 65536) - 32768 AS v
          FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d)),
        wins AS (
          SELECT doc_id AS media_id, win_idx,
                 CAST(SUM(v * v) AS BIGINT) AS energy
          FROM smp GROUP BY 1, 2),
        per_clip AS (
          SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
                 CAST(SUM(CASE WHEN energy > 2800000000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_active
          FROM wins GROUP BY 1),
        active AS (
          SELECT media_id, win_idx,
                 win_idx - row_number() OVER (PARTITION BY media_id ORDER BY win_idx)
                   AS sid
          FROM wins WHERE energy > 2800000000),
        segs AS (
          SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
                 CAST(MAX(seg_len) AS BIGINT) AS max_seg_len
          FROM (SELECT media_id, sid, COUNT(*) AS seg_len
                FROM active GROUP BY 1, 2)
          GROUP BY 1)
        SELECT p.media_id, p.n_windows, p.n_active,
               COALESCE(s.n_segments, 0) AS n_segments,
               COALESCE(s.max_seg_len, 0) AS max_seg_len
        FROM per_clip p LEFT JOIN segs s USING (media_id)
        ORDER BY p.media_id""")),

    // Product quantization (PQ) — the embedding-compression standard
    // behind billion-vector ANN indexes (FAISS IVF-PQ): split the 64-d
    // vector into 4 subspaces of 16 dims, train an independent k=4
    // codebook per subspace (one fixed-point Lloyd round from the
    // deterministic first-4-vec seeds, the q114 contract), assign every
    // vector its per-subspace code, and account the total squared
    // quantization error per (subspace, code). A 64-d float vector
    // compresses to 4 code bytes — 64× — and the audit columns are how
    // you decide the codebook is good enough before rewriting a corpus.
    // Same integer micro-unit determinism as q114: coordinates quantize
    // ONCE to BIGINT (floor(x·10⁶)); distances, argmins and centroid
    // means stay integer (the mean's floor-div is a <2⁵³ IEEE-exact
    // double op). 100 TB: codebooks are k×d literals (broadcast), so
    // train is two exchanges on the vector key and ASSIGN is map-side
    // only — the corpus-rewrite pass shuffles nothing.
    QueryDef(
      "q218_product_quantization",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("vec_id"), (col("dim") % 16).cast("long").as("dim"),
            (col("dim").cast("long") / 16).cast("long").as("sub"),
            floor(col("xf").cast("double") * lit(1000000.0d)).cast("long").as("xq"))
          .cutLineage()
        val c0 = ex.where(col("vec_id") < 4)
          .select(col("sub"), col("vec_id").as("cid"), col("dim"), col("xq").as("cq"))

        def assign(cent: DataFrame): DataFrame = {
          val d2 = ex.join(broadcast(cent), Seq("sub", "dim"))
            .groupBy(col("vec_id"), col("sub"), col("cid"))
            .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
          val w = Window.partitionBy(col("vec_id"), col("sub"))
            .orderBy(col("d2"), col("cid"))
          d2.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
            .select(col("vec_id"), col("sub"), col("cid"), col("d2"))
        }
        val c1 = ex.join(assign(c0).select(col("vec_id"), col("sub"), col("cid")),
            Seq("vec_id", "sub"))
          .groupBy(col("sub"), col("cid"), col("dim"))
          .agg(floor(sum(col("xq")).cast("double") / count(lit(1)))
            .cast("long").as("cq"))
        assign(c1)
          .groupBy(col("sub"), col("cid"))
          .agg(count(lit(1)).as("n_vectors"),
            sum(col("d2")).as("sq_err"),
            sum(col("vec_id")).as("id_checksum"))
          .orderBy(col("sub"), col("cid"))
      },
      Some("""
        WITH ex AS (
          SELECT vec_id, CAST(unnest(range(len(embedding))) % 16 AS BIGINT) AS dim,
                 CAST(unnest(range(len(embedding))) // 16 AS BIGINT) AS sub,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * CAST(1000000 AS DOUBLE)) AS BIGINT) AS xq
          FROM embeddings),
        c0 AS (SELECT sub, vec_id AS cid, dim, xq AS cq FROM ex WHERE vec_id < 4),
        d1 AS (SELECT e.vec_id, e.sub, c.cid,
                      SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
               FROM ex e JOIN c0 c ON c.sub = e.sub AND c.dim = e.dim
               GROUP BY 1, 2, 3),
        a1 AS (SELECT vec_id, sub, cid FROM (
                 SELECT vec_id, sub, cid, row_number() OVER (
                   PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
                 FROM d1) WHERE rn = 1),
        c1 AS (SELECT e.sub, a.cid, e.dim,
                      CAST(floor(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
               FROM ex e JOIN a1 a ON a.vec_id = e.vec_id AND a.sub = e.sub
               GROUP BY 1, 2, 3),
        d2_ AS (SELECT e.vec_id, e.sub, c.cid,
                       SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
                FROM ex e JOIN c1 c ON c.sub = e.sub AND c.dim = e.dim
                GROUP BY 1, 2, 3),
        a2 AS (SELECT vec_id, sub, cid, d2 FROM (
                 SELECT vec_id, sub, cid, d2, row_number() OVER (
                   PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
                 FROM d2_) WHERE rn = 1)
        SELECT sub, cid, CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(d2) AS BIGINT) AS sq_err,
               CAST(SUM(vec_id) AS BIGINT) AS id_checksum
        FROM a2 GROUP BY 1, 2
        ORDER BY sub, cid""")),

    // Maximal Marginal Relevance (MMR) — the diversity re-ranker layered
    // on every retrieval stack (RAG context selection, dedup-aware
    // search): greedily pick 5 of the top-12 relevance candidates,
    // scoring each round mmr = 0.7·rel − 0.3·max-sim-to-selected. The
    // greedy argmax is inherently sequential, but each of the 4 rounds
    // is a BOUNDED frame op (12 candidates × ≤5 picks), so the loop is
    // driver-orchestrated yet collect-free: anti-join remaining, max-sim
    // partial agg, 1-row limit, union into the selected frame (the
    // k-core/BFS loop discipline, localCheckpointed per round). Dots are
    // the native codegen'd VectorDot with the oracle's left-to-right
    // fold twin (q30 contract); 0.7/0.3 are explicit DOUBLE literals on
    // both engines (bare DuckDB decimals would widen differently).
    // 100 TB: relevance top-12 is the only corpus-wide pass (broadcast
    // 1-row query, rank cut); re-ranking cost is O(k²) regardless of
    // corpus size.
    QueryDef(
      "q225_mmr_rerank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val qv = e.where(col("vec_id") === 0).select(col("embedding").as("q_vec"))
        val cand = e.where(col("vec_id") > 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), col("embedding"),
            Similarity.dot(col("embedding"), col("q_vec")).as("rel"))
          .orderBy(col("rel").desc, col("vec_id")).limit(12)
          .cutLineage()
        var selected = cand.orderBy(col("rel").desc, col("vec_id")).limit(1)
          .select(col("vec_id"), col("embedding"), col("rel"),
            lit(1L).as("pick_order"), lit(0.0d).as("maxsim"))
          .cutLineage()
        for (r <- 2 to 5) {
          val remaining = cand
            .join(selected.select(col("vec_id")), Seq("vec_id"), "left_anti")
          val sims = remaining
            .crossJoin(broadcast(selected.select(col("embedding").as("s_emb"))))
            .groupBy(col("vec_id"))
            .agg(max(Similarity.dot(col("embedding"), col("s_emb"))).as("ms"))
          val top1 = remaining.join(sims, Seq("vec_id"))
            .orderBy((lit(0.7d) * col("rel") - lit(0.3d) * col("ms")).desc,
              col("vec_id"))
            .limit(1)
            .select(col("vec_id"), col("embedding"), col("rel"),
              lit(r.toLong).as("pick_order"), col("ms").as("maxsim"))
          selected = selected.unionByName(top1).cutLineage()
        }
        selected.select(col("pick_order"), col("vec_id"), col("rel"),
            col("maxsim"),
            (lit(0.7d) * col("rel") - lit(0.3d) * col("maxsim")).as("mmr"))
          .orderBy(col("pick_order"))
      },
      Some(s"""
        WITH qv AS (SELECT embedding q_vec FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id, e.embedding,
                 ${dotSql("e.embedding", "q.q_vec")} AS rel
          FROM embeddings e, qv q WHERE e.vec_id > 0),
        cand AS (SELECT * FROM scored ORDER BY rel DESC, vec_id LIMIT 12),
        p1 AS (SELECT vec_id, embedding, rel, 1 AS pick_order,
                      0.0::DOUBLE AS maxsim
               FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
        m2 AS (SELECT c.vec_id,
                      MAX(${dotSql("c.embedding", "p.embedding")}) AS ms
               FROM cand c, p1 p
               WHERE c.vec_id NOT IN (SELECT vec_id FROM p1)
               GROUP BY c.vec_id),
        p2 AS (SELECT c.vec_id, c.embedding, c.rel, 2, m.ms
               FROM cand c JOIN m2 m USING (vec_id)
               ORDER BY 0.7::DOUBLE * c.rel - 0.3::DOUBLE * m.ms DESC, c.vec_id
               LIMIT 1),
        s2 AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2),
        m3 AS (SELECT c.vec_id,
                      MAX(${dotSql("c.embedding", "p.embedding")}) AS ms
               FROM cand c, s2 p
               WHERE c.vec_id NOT IN (SELECT vec_id FROM s2)
               GROUP BY c.vec_id),
        p3 AS (SELECT c.vec_id, c.embedding, c.rel, 3, m.ms
               FROM cand c JOIN m3 m USING (vec_id)
               ORDER BY 0.7::DOUBLE * c.rel - 0.3::DOUBLE * m.ms DESC, c.vec_id
               LIMIT 1),
        s3 AS (SELECT * FROM s2 UNION ALL SELECT * FROM p3),
        m4 AS (SELECT c.vec_id,
                      MAX(${dotSql("c.embedding", "p.embedding")}) AS ms
               FROM cand c, s3 p
               WHERE c.vec_id NOT IN (SELECT vec_id FROM s3)
               GROUP BY c.vec_id),
        p4 AS (SELECT c.vec_id, c.embedding, c.rel, 4, m.ms
               FROM cand c JOIN m4 m USING (vec_id)
               ORDER BY 0.7::DOUBLE * c.rel - 0.3::DOUBLE * m.ms DESC, c.vec_id
               LIMIT 1),
        s4 AS (SELECT * FROM s3 UNION ALL SELECT * FROM p4),
        m5 AS (SELECT c.vec_id,
                      MAX(${dotSql("c.embedding", "p.embedding")}) AS ms
               FROM cand c, s4 p
               WHERE c.vec_id NOT IN (SELECT vec_id FROM s4)
               GROUP BY c.vec_id),
        p5 AS (SELECT c.vec_id, c.embedding, c.rel, 5, m.ms
               FROM cand c JOIN m5 m USING (vec_id)
               ORDER BY 0.7::DOUBLE * c.rel - 0.3::DOUBLE * m.ms DESC, c.vec_id
               LIMIT 1),
        s5 AS (SELECT * FROM s4 UNION ALL SELECT * FROM p5)
        SELECT CAST(pick_order AS BIGINT) AS pick_order, vec_id, rel, maxsim,
               0.7::DOUBLE * rel - 0.3::DOUBLE * maxsim AS mmr
        FROM s5
        ORDER BY pick_order""")),

    // Image near-duplicate detection through the REAL binary path:
    // Spark builds genuine 18×16 grayscale PPMs from a deterministic
    // pixel formula (25 shared base patterns + one per-image perturbed
    // stripe — the near-dup corpus), runs encode → true
    // nearest-neighbour resize to 9×8 → decode → 64-bit dHash
    // (horizontal gradient signs), then finds Hamming≤6 pairs by
    // 4×16-bit band LSH (a hash within distance 6 matches on ≥1 of 4
    // bands by pigeonhole — the SimHash q28 banding on image hashes).
    // The oracle never sees a byte: it predicts every gradient straight
    // from the pixel formula (resize index map sx=2x, sy=2y), so any
    // header, raster-layout, resample or bit-packing defect in the codec
    // chain hash-fails the gate. 100 TB: images stay opaque binary on
    // executors (one codec dispatch per partition), the hash is 8 bytes
    // per image, and banding keeps candidate pairs at Σbucket² — no
    // all-pairs image comparison exists at any scale.
    QueryDef(
      "q229_image_dhash_neardup",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Multimodal
        import graft.operators.Multimodal.{MediaRow, PpmCodec}
        val media = Tables.documents(s, dir)
          .select(col("doc_id")).where(col("doc_id") < 200)
          .as[Long]
          .map { id =>
            val g = id % 25
            val rgb = new Array[Byte](3 * 18 * 14)
            var y = 0
            while (y < 14) {
              var x = 0
              while (x < 18) {
                val bump = if ((x + y * 18) % 37 == id % 37) 40 else 0
                val v = ((7 * g + 31 * y + 13 * x + bump) % 256).toByte
                val o = 3 * (y * 18 + x)
                rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
                x += 1
              }
              y += 1
            }
            MediaRow(id, "image/ppm",
              PpmCodec.encode(PpmCodec.Image(18, 14, rgb)), 18, 14, 1)
          }
        val hashed = Multimodal
          .dHash(Multimodal.resize(media, 9, 7)(s), 8, 7)(s)
          .toDF().cutLineage()
        val banded = hashed.select(col("media_id"), col("dhash"),
            explode(sequence(lit(0), lit(3))).as("band"))
          .withColumn("band_val",
            expr("(dhash >> (14 * band)) & 16383"))
        val pairs = banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") &&
              col("a.band_val") === col("b.band_val") &&
              col("a.media_id") < col("b.media_id"))
          .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
            bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).cast("long")
              .as("hamming"))
          .distinct()
          .where(col("hamming") <= 6)
        pairs.orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        WITH ids AS (
          SELECT doc_id AS id, doc_id % 25 AS g FROM documents
          WHERE doc_id < 200),
        yy AS (SELECT id, g, unnest(range(0, 7)) AS y FROM ids),
        grid AS (SELECT id, g, y, unnest(range(0, 8)) AS x FROM yy),
        bits AS (
          SELECT id, y, x,
                 CASE WHEN
                   (7*g + 31*(2*y) + 13*(2*(x+1))
                    + CASE WHEN (2*(x+1) + 2*y*18) % 37 = id % 37
                           THEN 40 ELSE 0 END) % 256
                   >
                   (7*g + 31*(2*y) + 13*(2*x)
                    + CASE WHEN (2*x + 2*y*18) % 37 = id % 37
                           THEN 40 ELSE 0 END) % 256
                 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
          FROM grid),
        hashes AS (
          SELECT id AS media_id,
                 SUM(bit << (y * 8 + x)) AS dhash
          FROM bits GROUP BY 1),
        banded AS (
          SELECT media_id, dhash, unnest(range(0, 4)) AS band FROM hashes),
        bv AS (
          SELECT media_id, dhash, band,
                 (dhash >> (14 * band)) & 16383 AS band_val
          FROM banded),
        pairs AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                 CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
          FROM bv a JOIN bv b
            ON a.band = b.band AND a.band_val = b.band_val
           AND a.media_id < b.media_id)
        SELECT id_a, id_b, hamming
        FROM pairs
        WHERE hamming <= 6
        ORDER BY id_a, id_b""")),

    // SemDeDup (Abbas et al. 2023): semantic dedup = cluster the
    // embedding space, then remove near-duplicates WITHIN each cluster,
    // keeping one representative (here: the lowest vec_id of each dup
    // pair survives). Clusters are q114's fixed-point k-means (two
    // exact integer-quantized rounds from 4 seed centroids — identical
    // assignment, gate-proven there); within a cluster, candidates come
    // from a 6-plane SRP sub-bucket (64 cells — the paper's "don't do
    // all-pairs" at scale: cost is Σ cell², never cluster²), and the
    // dup decision is the EXACT quantized L2² ≤ (1.2e6)² on the
    // candidate pairs (integer arithmetic, engine-exact; recall is
    // bounded by the SRP blocking, stated like q27/q41). Per-cluster
    // output: sizes, candidate volume, dup pairs, removed set + checksum
    // — the numbers a curation run reports before committing the drop.
    // Scale: every join is equi (dim / cid+bucket / pair keys); the
    // shared quantized frame is localCheckpointed once (q167 pattern).
    QueryDef(
      "q270_semdedup",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        val e = Tables.embeddings(s, dir)
        val ex = e
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("vec_id"), col("dim").cast("long").as("dim"),
            floor(col("xf").cast("double") * lit(1000000.0d)).cast("long").as("xq"))
          .cutLineage()
        val c0 = ex.where(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("dim"), col("xq").as("cq"))
        def assign(cent: DataFrame): DataFrame = {
          val d2 = ex.join(broadcast(cent), Seq("dim"))
            .groupBy(col("vec_id"), col("cid"))
            .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
          val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
          d2.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
            .select(col("vec_id"), col("cid"))
        }
        def update(asg: DataFrame): DataFrame =
          ex.join(asg, Seq("vec_id"))
            .groupBy(col("cid"), col("dim"))
            .agg(floor(sum(col("xq")).cast("double") / count(lit(1)))
              .cast("long").as("cq"))
        val asg = assign(update(assign(c0))).cutLineage()
        // Planes scale with corpus size (q41's autoPlanes contract, target
        // cell occupancy 256 BEFORE the 4-way cluster split): fixed cells
        // would make within-cell pairs quadratic at 10x the vectors.
        val planes = Similarity.autoPlanes(e.count(), targetOccupancy = 256L)
        val bucketed = e
          .select(col("vec_id"),
            Similarity.srpBucket(col("embedding"), planes, 64).as("bkt"))
          .join(asg, Seq("vec_id"))
        val a = bucketed.select(col("cid"), col("bkt"), col("vec_id").as("id_a"))
        val b2 = bucketed.select(col("cid"), col("bkt"), col("vec_id").as("id_b"))
        val cand = a.join(b2, Seq("cid", "bkt")).where(col("id_a") < col("id_b"))
          .select(col("cid"), col("id_a"), col("id_b"))
          .cutLineage()
        // Exact d2 per candidate via ONE codegen'd VectorDot per pair on the
        // quantized-to-double arrays (|xq| <= 2e6 -> every product and sum
        // stays an exact integer < 2^53): d2 = <a,a> - 2<a,b> + <b,b>.
        // Equals the oracle's per-dim integer SUM bit-for-bit, without the
        // 64x row fan-out of a dim-join (measured 3x on the sf1 twin).
        val qv = e.select(col("vec_id"),
            expr("transform(embedding, x -> " +
              "CAST(floor(CAST(x AS DOUBLE) * 1000000.0D) AS DOUBLE))")
              .as("qv"))
          .withColumn("self", Similarity.dot(col("qv"), col("qv")))
          .cutLineage()
        val q1 = qv.select(col("vec_id").as("id_a"), col("qv").as("va"),
          col("self").as("sa"))
        val q2 = qv.select(col("vec_id").as("id_b"), col("qv").as("vb"),
          col("self").as("sb"))
        val dup = cand.join(q1, Seq("id_a")).join(q2, Seq("id_b"))
          .withColumn("d2",
            col("sa") - lit(2.0d) * Similarity.dot(col("va"), col("vb")) +
              col("sb"))
          .where(col("d2") <= lit(1.44e12d))
          .select(col("cid"), col("id_a"), col("id_b"))
          .cutLineage()
        val removed = dup.select(col("cid"), col("id_b")).distinct()
        val nv = asg.groupBy(col("cid")).agg(count(lit(1)).as("n_vectors"))
        val nc = cand.groupBy(col("cid")).agg(count(lit(1)).as("n_candidate_pairs"))
        val nd = dup.groupBy(col("cid")).agg(count(lit(1)).as("n_dup_pairs"))
        val nr = removed.groupBy(col("cid"))
          .agg(count(lit(1)).as("n_removed"), sum(col("id_b")).as("removed_checksum"))
        nv.join(nc, Seq("cid"), "left").join(nd, Seq("cid"), "left")
          .join(nr, Seq("cid"), "left")
          .select(col("cid"), col("n_vectors"),
            coalesce(col("n_candidate_pairs"), lit(0L)).as("n_candidate_pairs"),
            coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
            coalesce(col("n_removed"), lit(0L)).as("n_removed"),
            coalesce(col("removed_checksum"), lit(0L)).as("removed_checksum"))
          .orderBy(col("cid"))
      },
      Some("""
        WITH ex AS (
          SELECT vec_id, unnest(range(len(embedding))) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * CAST(1000000 AS DOUBLE)) AS BIGINT) AS xq
          FROM embeddings),
        c0 AS (SELECT vec_id AS cid, dim, xq AS cq FROM ex WHERE vec_id < 4),
        d1 AS (SELECT e.vec_id, c.cid,
                      SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
               FROM ex e JOIN c0 c USING (dim) GROUP BY 1, 2),
        a1 AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                 FROM d1) WHERE rn = 1),
        c1 AS (SELECT a.cid, e.dim,
                      CAST(floor(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
               FROM ex e JOIN a1 a USING (vec_id) GROUP BY 1, 2),
        d2_ AS (SELECT e.vec_id, c.cid,
                       SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
                FROM ex e JOIN c1 c USING (dim) GROUP BY 1, 2),
        a2 AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                 FROM d2_) WHERE rn = 1),
        np AS (
          SELECT GREATEST(4, LEAST(20, CAST(ceil(log2(GREATEST(1,
                   (SELECT COUNT(*) FROM embeddings) // 256))) AS INT))) AS np),
        bkt AS (
          SELECT vec_id,
                 CAST(list_sum(list_transform(range(0, (SELECT np FROM np)), j ->
                   CASE WHEN list_reduce(list_transform(range(0, 64), d ->
                          embedding[d+1]::DOUBLE *
                          ((((j*97 + d*31) % 13) - 6)::DOUBLE / 6.0::DOUBLE)),
                          (x, y) -> x + y) > 0
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS bkt
          FROM embeddings),
        bc AS (SELECT b.vec_id, b.bkt, a.cid FROM bkt b JOIN a2 a USING (vec_id)),
        cand AS (
          SELECT x.cid, x.vec_id AS id_a, y.vec_id AS id_b
          FROM bc x JOIN bc y
            ON x.cid = y.cid AND x.bkt = y.bkt AND x.vec_id < y.vec_id),
        dup AS (
          SELECT c.cid, c.id_a, c.id_b
          FROM cand c
          JOIN ex ea ON ea.vec_id = c.id_a
          JOIN ex eb ON eb.vec_id = c.id_b AND eb.dim = ea.dim
          GROUP BY 1, 2, 3
          HAVING SUM((ea.xq - eb.xq) * (ea.xq - eb.xq)) <= 1440000000000),
        removed AS (SELECT DISTINCT cid, id_b FROM dup),
        nv AS (SELECT cid, COUNT(*) AS n_vectors FROM a2 GROUP BY 1),
        nc AS (SELECT cid, COUNT(*) AS n_candidate_pairs FROM cand GROUP BY 1),
        nd AS (SELECT cid, COUNT(*) AS n_dup_pairs FROM dup GROUP BY 1),
        nr AS (SELECT cid, COUNT(*) AS n_removed,
                      CAST(SUM(id_b) AS BIGINT) AS removed_checksum
               FROM removed GROUP BY 1)
        SELECT v.cid, CAST(v.n_vectors AS BIGINT) AS n_vectors,
               CAST(COALESCE(c.n_candidate_pairs, 0) AS BIGINT) AS n_candidate_pairs,
               CAST(COALESCE(d.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
               CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(COALESCE(r.removed_checksum, 0) AS BIGINT) AS removed_checksum
        FROM nv v
        LEFT JOIN nc c USING (cid)
        LEFT JOIN nd d USING (cid)
        LEFT JOIN nr r USING (cid)
        ORDER BY v.cid""")),

    // Video shot-boundary detection — the VIDEO leg of the multimodal
    // surface (image q229, audio q212): payloads are concatenated-PPM
    // "video" containers that the REAL sequential codec path walks
    // (PpmCodec.decodeAt frame by frame, one dispatch per partition —
    // Multimodal.videoFrameHashes), each frame gets the same
    // horizontal-gradient dHash as the image path, and a boundary fires
    // where consecutive frames' Hamming distance exceeds 16. The
    // synthetic videos alternate gradient DIRECTION per 5-frame shot
    // (boundary Hamming ≈ 50) while a roving bump pixel drifts within
    // shots (≤ 4 bits) — wide margins on both sides of the threshold.
    // The oracle recomputes every frame hash from the generative
    // formula in pure SQL, so any byte-level defect in the container
    // walk (a mis-advanced offset, a dropped frame) hash-fails the
    // gate. Scale: frames decode lazily (memory = one frame, not one
    // video), hashes are 8 bytes per frame, and the boundary scan is a
    // per-video KEYED window — nothing global, nothing all-pairs.
    QueryDef(
      "q320_video_shot_boundaries",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Multimodal.{MediaRow, PpmCodec}
        val media = Tables.documents(s, dir)
          .select(col("doc_id")).where(col("doc_id") < 120)
          .as[Long]
          .map { id =>
            val nf = (12 + id % 9).toInt
            val frames = (0 until nf).map { f =>
              val par = (f / 5) % 2
              val rgb = new Array[Byte](3 * 9 * 7)
              var y = 0
              while (y < 7) {
                var x = 0
                while (x < 9) {
                  val gx = if (par == 0) 20 * x else 20 * (8 - x)
                  val bump =
                    if ((x + 9 * y + f) % 37 == (id % 37).toInt) 40 else 0
                  val v =
                    ((7 * (id % 25) + 31 * y + gx + bump) % 256).toByte
                  val o = 3 * (y * 9 + x)
                  rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
                  x += 1
                }
                y += 1
              }
              PpmCodec.encode(PpmCodec.Image(9, 7, rgb))
            }
            MediaRow(id, "video/ppm", frames.reduce(_ ++ _), 9, 7, nf)
          }
        val fh = Multimodal.videoFrameHashes(media, 8, 7)(s)
          .toDF().cutLineage()
        val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
        val lagged = fh
          .withColumn("prev", lag(col("dhash"), 1).over(w))
          .withColumn("hamming",
            when(col("prev").isNull, 0L)
              .otherwise(bit_count(col("prev").bitwiseXOR(col("dhash")))
                .cast("long")))
          .withColumn("boundary",
            col("prev").isNotNull && col("hamming") > 16L)
        lagged.groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            (sum(when(col("boundary"), 1L).otherwise(0L)) + 1L)
              .as("n_shots"),
            sum(when(col("boundary"), col("frame_idx").cast("long"))
              .otherwise(0L)).as("boundary_sum"),
            sum(col("hamming")).as("total_hamming"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH ids AS (
          SELECT doc_id AS id, doc_id % 25 AS g, doc_id % 37 AS bp
          FROM documents WHERE doc_id < 120),
        fr AS (SELECT id, g, bp,
                      unnest(range(0, CAST(12 + id % 9 AS BIGINT))) AS f
               FROM ids),
        yy AS (SELECT id, g, bp, f, unnest(range(0, 7)) AS y FROM fr),
        grid AS (SELECT id, g, bp, f, y, unnest(range(0, 8)) AS x FROM yy),
        bits AS (
          SELECT id, f, y, x,
            CASE WHEN
              ((7*g + 31*y
                + CASE WHEN (f // 5) % 2 = 0 THEN 20*(x+1)
                       ELSE 20*(8-(x+1)) END
                + CASE WHEN ((x+1) + 9*y + f) % 37 = bp
                       THEN 40 ELSE 0 END) % 256)
              >
              ((7*g + 31*y
                + CASE WHEN (f // 5) % 2 = 0 THEN 20*x
                       ELSE 20*(8-x) END
                + CASE WHEN (x + 9*y + f) % 37 = bp
                       THEN 40 ELSE 0 END) % 256)
            THEN 1::BIGINT ELSE 0::BIGINT END AS bit
          FROM grid),
        hashes AS (
          SELECT id AS media_id, f AS frame_idx,
                 SUM(bit << (y * 8 + x)) AS dhash
          FROM bits GROUP BY 1, 2),
        lagged AS (
          SELECT media_id, frame_idx, dhash,
                 lag(dhash) OVER (
                   PARTITION BY media_id ORDER BY frame_idx) AS prev
          FROM hashes),
        ham AS (
          SELECT media_id, frame_idx,
                 CASE WHEN prev IS NULL THEN 0
                      ELSE CAST(bit_count(xor(prev, dhash)) AS BIGINT)
                 END AS hamming
          FROM lagged)
        SELECT media_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN hamming > 16 THEN 1 ELSE 0 END) + 1
                 AS BIGINT) AS n_shots,
               CAST(SUM(CASE WHEN hamming > 16 THEN frame_idx ELSE 0 END)
                 AS BIGINT) AS boundary_sum,
               CAST(SUM(hamming) AS BIGINT) AS total_hamming
        FROM ham GROUP BY 1 ORDER BY media_id""")),

    // Mutual-kNN graph — the SYMMETRIC neighborhood filter diversity/
    // clustering pipelines build on top of plain kNN (UMAP's graph
    // stage, reciprocal-NN dedup): an edge survives only if a is in
    // b's top-k AND b is in a's top-k, which strips the hub-dominated
    // asymmetric edges plain kNN is full of. Candidates come from the
    // q41 SRP-bucket blocking (occupancy-driven plane count on BOTH
    // engines, so in-bucket pair cost stays constant as the corpus
    // grows); per-node top-3 via a rank window KEYED on the node
    // (partition size = bucket occupancy, bounded by the plane
    // autosizing, never corpus-proportional). The mutual filter is one
    // equi-hash self-join of the top-k frame on the reversed pair key.
    // Emits surviving pairs with both direction ranks — rank_ab ≠
    // rank_ba asymmetry is the point. Scale: bucket join + keyed
    // window + pair-key join; nothing all-pairs, nothing global.
    QueryDef(
      "q337_mutual_knn",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"))
        val planes = Similarity.autoPlanes(e.count(), targetOccupancy = 64L)
        val b = e.select(col("vec_id"), col("embedding"),
            Similarity.srpBucket(col("embedding"), planes, 64).as("bucket"))
          .cutLineage()
        val dots = b.as("a").join(b.as("c"),
            col("a.bucket") === col("c.bucket") &&
              col("a.vec_id") =!= col("c.vec_id"))
          .select(col("a.vec_id").as("src"), col("c.vec_id").as("dst"),
            Similarity.cosine(col("a.embedding"), col("c.embedding"))
              .as("cos"))
        val w = Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("dst"))
        // consumed by both sides of the mutual join — sanctioned cut
        val top = dots.withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3)
          .select(col("src"), col("dst"), col("cos"), col("rnk"))
          .cutLineage()
        top.as("f").join(top.as("r"),
            col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
          .where(col("f.src") < col("f.dst"))
          .select(col("f.src").as("id_a"), col("f.dst").as("id_b"),
            col("f.cos").as("cos"),
            col("f.rnk").cast("long").as("rank_ab"),
            col("r.rnk").cast("long").as("rank_ba"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH p AS (
          SELECT GREATEST(4, LEAST(20, CAST(ceil(log2(GREATEST(1,
                   (SELECT COUNT(*) FROM embeddings) // 64))) AS INT))) AS np),
        b AS (
          SELECT vec_id, embedding,
                 CAST(list_sum(list_transform(range(0,(SELECT np FROM p)), j ->
                   CASE WHEN list_reduce(list_transform(range(0,64), d ->
                          embedding[d+1]::DOUBLE * ((((j*97 + d*31) % 13) - 6)::DOUBLE / 6.0::DOUBLE)), (x,y)->x+y) > 0
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
          FROM embeddings),
        dots AS (
          SELECT a.vec_id AS src, c.vec_id AS dst,
                 ${dotSql("a.embedding", "c.embedding")}
                   / (sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("c.embedding", "c.embedding")})) AS cos
          FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
        ranked AS (
          SELECT src, dst, cos,
                 row_number() OVER (PARTITION BY src
                   ORDER BY cos DESC, dst) AS rnk
          FROM dots),
        topk AS (SELECT src, dst, cos, rnk FROM ranked WHERE rnk <= 3)
        SELECT f.src AS id_a, f.dst AS id_b, f.cos AS cos,
               CAST(f.rnk AS BIGINT) AS rank_ab,
               CAST(r.rnk AS BIGINT) AS rank_ba
        FROM topk f JOIN topk r ON f.src = r.dst AND f.dst = r.src
        WHERE f.src < f.dst
        ORDER BY id_a, id_b""")),

    // Cluster-quality audit of the q114 fixed-point k-means: simplified
    // silhouette + Davies-Bouldin, the two internal validity indices a
    // SemDeDup-style pipeline checks BEFORE trusting cluster-local dedup
    // (q270): bad clustering silently under-dedups across cluster
    // borders. Both indices use CENTROID distances only (the classic
    // all-pairs silhouette is O(n²) — a non-starter; the centroid form
    // is the standard large-scale surrogate) on q114's exact integer
    // lattice: a = squared distance to own centroid, b = min squared
    // distance to any other, silhouette = (b−a)·10⁶ div max(a,b) — all
    // nonneg integers, no sqrt. Davies-Bouldin on the squared-distance
    // variant: S_k = mean within-cluster squared distance (DECIMAL(38,0)
    // sum, one floor div), R_ij = (S_i+S_j)·10⁶ div ‖c_i−c_j‖², DB =
    // mean_k max_j R_kj. Scale: per-vec work is a k=4 broadcast fan-out
    // + partial aggs on vec_id; cluster/centroid tables are k-sized —
    // the audit costs one extra assign pass over the corpus, nothing
    // quadratic anywhere.
    QueryDef(
      "q346_cluster_quality",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("vec_id"), col("dim").cast("long").as("dim"),
            floor(col("xf").cast("double") * lit(1000000.0d)).cast("long").as("xq"))
          .cutLineage()
        val c0 = ex.where(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("dim"), col("xq").as("cq"))
        def assign(cent: DataFrame): DataFrame = {
          val d2 = ex.join(broadcast(cent), Seq("dim"))
            .groupBy(col("vec_id"), col("cid"))
            .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
          val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
          d2.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
            .select(col("vec_id"), col("cid"))
        }
        def update(asg: DataFrame): DataFrame =
          ex.join(asg, Seq("vec_id"))
            .groupBy(col("cid"), col("dim"))
            .agg(floor(sum(col("xq")).cast("double") / count(lit(1)))
              .cast("long").as("cq"))
        val c2 = update(assign(update(assign(c0)))).cutLineage()
        val d3 = ex.join(broadcast(c2), Seq("dim"))
          .groupBy(col("vec_id"), col("cid"))
          .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
        val w3 = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
        val per = d3.withColumn("rn", row_number().over(w3))
          .groupBy(col("vec_id"))
          .agg(max(when(col("rn") === 1, col("cid"))).as("cid"),
            max(when(col("rn") === 1, col("d2"))).as("a"),
            min(when(col("rn") > 1, col("d2"))).as("b"))
          .withColumn("s_ppm",
            when(greatest(col("a"), col("b")) === 0L, 0L)
              .otherwise(expr(
                """cast(((cast(b as decimal(38,0)) - a) * 1000000)
                   div greatest(a, b) as bigint)""")))
        val clus = per.groupBy(col("cid"))
          .agg(count(lit(1)).as("n_vectors"), sum(col("s_ppm")).as("sum_s"),
            sum(col("a").cast("decimal(38,0)")).as("sum_a"))
          .withColumn("mean_sil_ppm", expr("sum_s div n_vectors"))
          .withColumn("s_k", expr("cast(sum_a div n_vectors as bigint)"))
          .select(col("cid"), col("n_vectors"), col("mean_sil_ppm"), col("s_k"))
          .cutLineage()
        val m2 = c2.as("x").join(c2.as("y"),
            col("x.dim") === col("y.dim") && col("x.cid") =!= col("y.cid"))
          .groupBy(col("x.cid").as("cid"), col("y.cid").as("cj"))
          .agg(sum((col("x.cq") - col("y.cq")) * (col("x.cq") - col("y.cq")))
            .as("m2"))
        val r = m2
          .join(clus.select(col("cid"), col("s_k").as("si")), Seq("cid"))
          .join(clus.select(col("cid").as("cj"), col("s_k").as("sj")), Seq("cj"))
          .withColumn("rij", when(col("m2") === 0L, lit(1000000000000L))
            .otherwise(expr(
              "cast(((cast(si as decimal(38,0)) + sj) * 1000000) div m2 as bigint)")))
          .groupBy(col("cid")).agg(max(col("rij")).as("db_k_ppm"))
        val dbi = r.agg(expr("sum(db_k_ppm) div count(1)").as("db_index_ppm"))
        clus.join(r, Seq("cid"))
          .crossJoin(broadcast(dbi))
          .select(col("cid"), col("n_vectors"), col("mean_sil_ppm"),
            col("s_k"), col("db_k_ppm"), col("db_index_ppm"))
          .orderBy(col("cid"))
      },
      Some("""
        WITH ex AS MATERIALIZED (
          SELECT vec_id, unnest(range(len(embedding))) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * CAST(1000000 AS DOUBLE)) AS BIGINT) AS xq
          FROM embeddings),
        c0 AS (SELECT vec_id AS cid, dim, xq AS cq FROM ex WHERE vec_id < 4),
        d1 AS (SELECT e.vec_id, c.cid,
                      SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
               FROM ex e JOIN c0 c USING (dim) GROUP BY 1, 2),
        a1 AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                 FROM d1) WHERE rn = 1),
        c1 AS (SELECT a.cid, e.dim,
                      CAST(floor(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
               FROM ex e JOIN a1 a USING (vec_id) GROUP BY 1, 2),
        d2_ AS (SELECT e.vec_id, c.cid,
                       SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
                FROM ex e JOIN c1 c USING (dim) GROUP BY 1, 2),
        a2 AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                 FROM d2_) WHERE rn = 1),
        c2 AS MATERIALIZED (
               SELECT a.cid, e.dim,
                      CAST(floor(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
               FROM ex e JOIN a2 a USING (vec_id) GROUP BY 1, 2),
        d3 AS (SELECT e.vec_id, c.cid,
                      SUM((e.xq - c.cq) * (e.xq - c.cq)) AS d2
               FROM ex e JOIN c2 c USING (dim) GROUP BY 1, 2),
        per AS (
          SELECT vec_id,
                 MAX(CASE WHEN rn = 1 THEN cid END) AS cid,
                 MAX(CASE WHEN rn = 1 THEN d2 END) AS a,
                 MIN(CASE WHEN rn > 1 THEN d2 END) AS b
          FROM (SELECT vec_id, cid, d2,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY d2, cid) AS rn
                FROM d3)
          GROUP BY 1),
        sil AS (
          SELECT vec_id, cid, a,
                 CASE WHEN GREATEST(a, b) = 0 THEN 0
                      ELSE CAST(((CAST(b AS HUGEINT) - a) * 1000000)
                                // GREATEST(a, b) AS BIGINT) END AS s_ppm
          FROM per),
        clus AS MATERIALIZED (
          SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vectors,
                 CAST(CAST(SUM(s_ppm) AS HUGEINT) // COUNT(*) AS BIGINT)
                   AS mean_sil_ppm,
                 CAST(CAST(SUM(a) AS HUGEINT) // COUNT(*) AS BIGINT) AS s_k
          FROM sil GROUP BY 1),
        m2 AS (
          SELECT x.cid AS cid, y.cid AS cj,
                 SUM((x.cq - y.cq) * (x.cq - y.cq)) AS m2
          FROM c2 x JOIN c2 y ON x.dim = y.dim AND x.cid <> y.cid
          GROUP BY 1, 2),
        r AS MATERIALIZED (
          SELECT m2.cid, MAX(CASE WHEN m2.m2 = 0 THEN 1000000000000
                 ELSE CAST(((CAST(ci.s_k AS HUGEINT) + cj.s_k) * 1000000)
                           // m2.m2 AS BIGINT) END) AS db_k_ppm
          FROM m2
          JOIN clus ci ON ci.cid = m2.cid
          JOIN clus cj ON cj.cid = m2.cj
          GROUP BY 1),
        dbi AS (SELECT CAST(CAST(SUM(db_k_ppm) AS HUGEINT) // COUNT(*)
                       AS BIGINT) AS db_index_ppm FROM r)
        SELECT c.cid, c.n_vectors, c.mean_sil_ppm, c.s_k, r.db_k_ppm,
               d.db_index_ppm
        FROM clus c JOIN r ON r.cid = c.cid CROSS JOIN dbi d
        ORDER BY c.cid""")),

    // Top principal direction by power iteration — PCA's first
    // eigenvector from q204's covariance statistic, the drift/whitening
    // primitive (project onto v₁ to monitor where a corpus actually
    // moves). The d×d SCATTER matrix n·Σxy − Σx·Σy is exact
    // DECIMAL(38,0) from the integer micro-lattice (q204 before its one
    // double division); power iteration runs on the BOUNDED 64×64 frame
    // — three audited synchronous rounds from the all-ones micro
    // vector, each round one matvec (64-key join + partial sum) and a
    // RATIONAL renormalization: v'ᵢ = sign(wᵢ)·(|wᵢ|·10⁶ div max|w|) —
    // abs-then-sign so truncation-toward-zero is engine-identical (no
    // float L2 norm anywhere). The Rayleigh quotient v·Mv/(v·v) comes
    // out once, rescaled to covariance units in ppm. Decimal headroom:
    // |w| ≤ d·n²·10¹⁸ holds to n ≈ 6·10⁴ per shard — larger corpora
    // first rescale the scatter to the per-row lattice (divide by n).
    // Scale: one corpus pass for the moments (≤2080-row map partials);
    // everything after lives on d²-sized frames.
    QueryDef(
      "q348_power_iteration",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        // the 2080-pair explode below is heavy per row and the corpus
        // scan under-splits — fan out so both moment passes parallelize
        val q = graft.operators.Skew.fanOutRead(
          Tables.embeddings(s, dir).select(col("vec_id"),
            transform(col("embedding"),
              x => (x.cast("double").cast("decimal(18,6)") * 1000000).cast("long")).as("v")))
        val d = 64
        val pairRows = q.select(explode(flatten(
            transform(sequence(lit(1), lit(d)), i =>
              transform(sequence(i, lit(d)), j =>
                struct(i.as("i"), j.as("j"),
                  (element_at(col("v"), i) * element_at(col("v"), j)).as("xy"))))))
            .as("p"))
          .select(col("p.i").cast("long").as("i"), col("p.j").cast("long").as("j"),
            col("p.xy").as("xy"))
        val sums = pairRows.groupBy(col("i"), col("j"))
          .agg(count(lit(1)).as("n"), sum(col("xy")).as("sxy"))
        val dims = q.select(posexplode(col("v")).as(Seq("i0", "x")))
          .select((col("i0") + 1).cast("long").as("i"), col("x"))
          .groupBy(col("i")).agg(sum(col("x")).as("sx"))
        val upper = sums
          .join(broadcast(dims.select(col("i"), col("sx").as("sxi"))), Seq("i"))
          .join(broadcast(dims.select(col("i").as("j"), col("sx").as("sxj"))), Seq("j"))
          .select(col("i"), col("j"), col("n"),
            expr("""cast(n as decimal(38,0)) * sxy
                    - cast(sxi as decimal(38,0)) * sxj""").as("sc"))
        val mfull = upper.select(col("i"), col("j"), col("n"), col("sc"))
          .unionAll(upper.where(col("i") =!= col("j"))
            .select(col("j").as("i"), col("i").as("j"), col("n"), col("sc")))
          .cutLineage()
        def step(v: DataFrame): DataFrame = {
          val w = mfull.join(v.select(col("i").as("j"), col("vj")), Seq("j"))
            .groupBy(col("i")).agg(sum(expr("sc * vj")).as("w"))
          val mx = w.agg(max(abs(col("w"))).as("mx"))
          w.crossJoin(broadcast(mx))
            .select(col("i"),
              when(col("mx") === 0, 0L).otherwise(expr(
                """case when w < 0 then -1L else 1L end
                   * cast((abs(w) * 1000000) div mx as bigint)"""))
                .as("vj"))
        }
        val v0 = mfull.select(col("i")).distinct()
          .select(col("i"), lit(1000000L).as("vj"))
        val v3 = step(step(step(v0).cutLineage()).cutLineage()).cutLineage()
        val w4 = mfull.join(v3.select(col("i").as("j"), col("vj")), Seq("j"))
          .groupBy(col("i")).agg(max(col("n")).as("n"),
            sum(expr("sc * vj")).as("w"))
        val lam = w4.join(v3, Seq("i"))
          .agg(max(col("n")).as("n_rows"),
            sum(expr("cast(vj as decimal(38,0)) * w")).as("num"),
            sum(expr("cast(vj as decimal(38,0)) * vj")).as("den"))
          .select(col("n_rows"), expr(
            """cast(num div (den * cast(n_rows as decimal(38,0)) * n_rows
                * 1000000) as bigint)""").as("lambda_cov_ppm"))
        v3.crossJoin(broadcast(lam))
          .select(col("i").as("dim"), col("vj").as("component_micro"),
            col("n_rows"), col("lambda_cov_ppm"))
          .orderBy(col("dim"))
      },
      Some("""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(CAST(x::DOUBLE AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS v
          FROM embeddings),
        ij AS (
          SELECT i.i AS i, j.j AS j
          FROM (SELECT unnest(range(1, 65)) AS i) i,
               (SELECT unnest(range(1, 65)) AS j) j
          WHERE j.j >= i.i),
        sums AS (
          SELECT ij.i, ij.j,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q.v[ij.i] * q.v[ij.j]) AS BIGINT) AS sxy
          FROM q, ij
          GROUP BY 1, 2),
        dims AS (
          SELECT d.i, CAST(SUM(q.v[d.i]) AS BIGINT) AS sx
          FROM q, (SELECT unnest(range(1, 65)) AS i) d
          GROUP BY 1),
        upper_ AS (
          SELECT s.i, s.j, s.n,
                 CAST(s.n AS HUGEINT) * s.sxy
                   - CAST(di.sx AS HUGEINT) * dj.sx AS sc
          FROM sums s
          JOIN dims di ON di.i = s.i
          JOIN dims dj ON dj.i = s.j),
        m AS MATERIALIZED (
          SELECT i, j, n, sc FROM upper_
          UNION ALL
          SELECT j, i, n, sc FROM upper_ WHERE i <> j),
        v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS vj FROM m),
        w1 AS (SELECT m.i, SUM(m.sc * v.vj) AS w
               FROM m JOIN v0 v ON v.i = m.j GROUP BY 1),
        v1 AS MATERIALIZED (
          SELECT i, CASE WHEN mx = 0 THEN 0
                 ELSE (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                   * CAST((abs(w) * 1000000) // mx AS BIGINT) END AS vj
          FROM w1 CROSS JOIN (SELECT MAX(abs(w)) AS mx FROM w1)),
        w2 AS (SELECT m.i, SUM(m.sc * v.vj) AS w
               FROM m JOIN v1 v ON v.i = m.j GROUP BY 1),
        v2 AS MATERIALIZED (
          SELECT i, CASE WHEN mx = 0 THEN 0
                 ELSE (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                   * CAST((abs(w) * 1000000) // mx AS BIGINT) END AS vj
          FROM w2 CROSS JOIN (SELECT MAX(abs(w)) AS mx FROM w2)),
        w3 AS (SELECT m.i, SUM(m.sc * v.vj) AS w
               FROM m JOIN v2 v ON v.i = m.j GROUP BY 1),
        v3 AS MATERIALIZED (
          SELECT i, CASE WHEN mx = 0 THEN 0
                 ELSE (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                   * CAST((abs(w) * 1000000) // mx AS BIGINT) END AS vj
          FROM w3 CROSS JOIN (SELECT MAX(abs(w)) AS mx FROM w3)),
        w4 AS (SELECT m.i, MAX(m.n) AS n, SUM(m.sc * v.vj) AS w
               FROM m JOIN v3 v ON v.i = m.j GROUP BY 1),
        lam AS (
          SELECT MAX(w4.n) AS n_rows,
                 CAST(SUM(CAST(v3.vj AS HUGEINT) * w4.w)
                      // (SUM(CAST(v3.vj AS HUGEINT) * v3.vj)
                         * CAST(MAX(w4.n) AS HUGEINT) * MAX(w4.n)
                         * 1000000) AS BIGINT) AS lambda_cov_ppm
          FROM w4 JOIN v3 ON v3.i = w4.i)
        SELECT v3.i AS dim, v3.vj AS component_micro, lam.n_rows,
               lam.lambda_cov_ppm
        FROM v3 CROSS JOIN lam
        ORDER BY dim""")),

    // Grid-DBSCAN over the embedding corpus — density-based clustering
    // with noise, the shape k-means (q114) cannot express (k-means
    // forces every point into a cluster; DBSCAN's noise verdict is what
    // a curation pipeline uses to QUARANTINE outlier embeddings before
    // SemDeDup). The 64-d corpus projects onto two deterministic ±1
    // random hyperplanes (the q31 SRP discipline, md5-seeded, exact
    // int64 dot products on the 10⁶ micro-lattice), quantizes to a
    // W=500k grid with ENGINE-NEUTRAL floored cells (the |·|-split
    // ceiling form — Spark `div` truncates, DuckDB `//` floors, so
    // neither engine's operator is used on a negative numerator), and
    // runs the cell-grained DBSCAN: core cells carry ≥2× mean density
    // (relative rule — sf-invariant), core cells merge by 8-adjacency
    // min-label propagation (6 synchronous rounds on the CELL table,
    // convergence GATED — labels stable between rounds 5 and 6),
    // border points sit in non-core cells adjacent to a core cell and
    // adopt the min adjacent cluster, the rest is noise. Scale: the
    // corpus appears in exactly two passes (projection rollup, point
    // classification join); everything else operates on the occupied-
    // cell table, bounded by the projection's value range over W —
    // never by corpus size. A production variant swaps the 2-d SRP
    // plane for the PQ codebook grid (q218) with the same cell-CC.
    QueryDef(
      "q360_grid_dbscan",
      (s, dir) => {
        import graft.functions.Kernels.{md5Bits, md5BitsModK}
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("vec_id"), col("dim").cast("long").as("dim"),
            floor(col("xf").cast("double") * lit(1000000.0d)).cast("long").as("xq"))
        val sg = ex.select(col("dim")).distinct()
          .withColumn("s1",
            md5BitsModK(md5Bits(concat(lit("dbscan:1:"),
              col("dim").cast("string"))), 2L) * 2L - 1L)
          .withColumn("s2",
            md5BitsModK(md5Bits(concat(lit("dbscan:2:"),
              col("dim").cast("string"))), 2L) * 2L - 1L)
        val pc = ex.join(broadcast(sg), Seq("dim"))
          .groupBy(col("vec_id"))
          .agg(sum(col("xq") * col("s1")).as("p1"),
            sum(col("xq") * col("s2")).as("p2"))
          .withColumn("cx", expr(
            "CASE WHEN p1 < 0 THEN -((-p1 + 499999) div 500000) ELSE p1 div 500000 END"))
          .withColumn("cy", expr(
            "CASE WHEN p2 < 0 THEN -((-p2 + 499999) div 500000) ELSE p2 div 500000 END"))
          .select(col("vec_id"), col("cx"), col("cy"))
          .cutLineage()
        val cells = pc.groupBy(col("cx"), col("cy"))
          .agg(count(lit(1)).as("n")).cutLineage()
        val tot = cells.agg(sum(col("n")).as("nt"),
          count(lit(1)).as("nc"))
        val core = cells.crossJoin(broadcast(tot))
          .where(col("n") * col("nc") >= col("nt") * 2)
          .withColumn("cid", (col("cx") + 500L) * 1000L + col("cy") + 500L)
          .select(col("cx"), col("cy"), col("cid"), col("n"))
          .cutLineage()
        val nbr = core.select(col("cx"), col("cy"), col("cid"))
          .withColumn("dx", explode(expr("sequence(-1L, 1L)")))
          .withColumn("dy", explode(expr("sequence(-1L, 1L)")))
          .select((col("cx") + col("dx")).as("nx"),
            (col("cy") + col("dy")).as("ny"), col("cid"))
        val adjE = nbr.join(
            core.select(col("cx").as("nx"), col("cy").as("ny"),
              col("cid").as("cid2")), Seq("nx", "ny"))
          .select(col("cid"), col("cid2")).cutLineage()
        def lround(l: org.apache.spark.sql.DataFrame) =
          adjE.join(l.withColumnRenamed("cid", "cid2"), Seq("cid2"))
            .groupBy(col("cid")).agg(min(col("lbl")).as("lbl"))
        val l0 = core.select(col("cid"), col("cid").as("lbl"))
        val l5 = Iterator.iterate(l0)(l => lround(l).cutLineage())
          .drop(5).next()
        val l6 = lround(l5)
        val conv = l5.withColumnRenamed("lbl", "lbl5")
          .join(l6.withColumnRenamed("lbl", "lbl6"), Seq("cid"))
          .agg(sum(when(col("lbl5") =!= col("lbl6"), 1L).otherwise(0L))
            .as("n_changed"))
          .select((col("n_changed") === 0L).as("converged"))
        val coreL = core.join(l6, Seq("cid"))
          .select(col("cx"), col("cy"), col("cid"), col("n"), col("lbl"))
          .cutLineage()
        val borderL = cells
          .join(core.select(col("cx"), col("cy"), lit(1).as("is_core")),
            Seq("cx", "cy"), "left")
          .where(col("is_core").isNull)
          .select(col("cx"), col("cy"), col("n"))
          .withColumn("dx", explode(expr("sequence(-1L, 1L)")))
          .withColumn("dy", explode(expr("sequence(-1L, 1L)")))
          .select(col("cx"), col("cy"), col("n"),
            (col("cx") + col("dx")).as("nx"),
            (col("cy") + col("dy")).as("ny"))
          .join(coreL.select(col("cx").as("nx"), col("cy").as("ny"),
            col("lbl")), Seq("nx", "ny"))
          .groupBy(col("cx"), col("cy"))
          .agg(max(col("n")).as("n"), min(col("lbl")).as("lbl"))
        val clus = coreL.groupBy(col("lbl"))
          .agg(count(lit(1)).as("n_core_cells"),
            sum(col("n")).as("n_core_points"))
          .join(borderL.groupBy(col("lbl"))
            .agg(sum(col("n")).as("n_border_points")), Seq("lbl"), "left")
          .select(col("lbl").as("cluster_id"), col("n_core_cells"),
            col("n_core_points"),
            coalesce(col("n_border_points"), lit(0L)).as("n_border_points"))
        val noise = tot.crossJoin(
            clus.agg(sum(col("n_core_points") + col("n_border_points"))
              .as("assigned")))
          .select((col("nt") - coalesce(col("assigned"), lit(0L)))
            .as("n_noise"))
        clus.crossJoin(broadcast(noise)).crossJoin(broadcast(conv))
          .orderBy(col("cluster_id"))
      },
      Some("""
        WITH ex AS MATERIALIZED (
          SELECT vec_id, unnest(range(len(embedding))) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * CAST(1000000 AS DOUBLE)) AS BIGINT) AS xq
          FROM embeddings),
        sg AS (
          SELECT dim,
                 CAST(md5_number_lower('dbscan:1:' || dim) % 2 AS BIGINT)
                   * 2 - 1 AS s1,
                 CAST(md5_number_lower('dbscan:2:' || dim) % 2 AS BIGINT)
                   * 2 - 1 AS s2
          FROM (SELECT DISTINCT dim FROM ex)),
        pc AS MATERIALIZED (
          SELECT vec_id,
                 CAST(CASE WHEN p1 < 0 THEN -((-p1 + 499999) // 500000)
                      ELSE p1 // 500000 END AS BIGINT) AS cx,
                 CAST(CASE WHEN p2 < 0 THEN -((-p2 + 499999) // 500000)
                      ELSE p2 // 500000 END AS BIGINT) AS cy
          FROM (SELECT e.vec_id, SUM(e.xq * g.s1) AS p1,
                       SUM(e.xq * g.s2) AS p2
                FROM ex e JOIN sg g USING (dim) GROUP BY 1)),
        cells AS MATERIALIZED (
          SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n
          FROM pc GROUP BY 1, 2),
        tot AS (SELECT SUM(n) AS nt, COUNT(*) AS nc FROM cells),
        core AS MATERIALIZED (
          SELECT cx, cy, (cx + 500) * 1000 + cy + 500 AS cid, n
          FROM cells CROSS JOIN tot WHERE n * nc >= nt * 2),
        adje AS MATERIALIZED (
          SELECT a.cid, b.cid AS cid2
          FROM (SELECT c.cx + dx.dx AS nx, c.cy + dy.dy AS ny, c.cid
                FROM core c,
                     (SELECT unnest([-1, 0, 1]) AS dx) dx,
                     (SELECT unnest([-1, 0, 1]) AS dy) dy) a
          JOIN core b ON b.cx = a.nx AND b.cy = a.ny),
        l0 AS (SELECT cid, cid AS lbl FROM core),
        l1 AS (SELECT e.cid, MIN(l.lbl) AS lbl FROM adje e
               JOIN l0 l ON l.cid = e.cid2 GROUP BY 1),
        l2 AS (SELECT e.cid, MIN(l.lbl) AS lbl FROM adje e
               JOIN l1 l ON l.cid = e.cid2 GROUP BY 1),
        l3 AS (SELECT e.cid, MIN(l.lbl) AS lbl FROM adje e
               JOIN l2 l ON l.cid = e.cid2 GROUP BY 1),
        l4 AS (SELECT e.cid, MIN(l.lbl) AS lbl FROM adje e
               JOIN l3 l ON l.cid = e.cid2 GROUP BY 1),
        l5 AS MATERIALIZED (
               SELECT e.cid, MIN(l.lbl) AS lbl FROM adje e
               JOIN l4 l ON l.cid = e.cid2 GROUP BY 1),
        l6 AS MATERIALIZED (
               SELECT e.cid, MIN(l.lbl) AS lbl FROM adje e
               JOIN l5 l ON l.cid = e.cid2 GROUP BY 1),
        conv AS (
          SELECT SUM(CASE WHEN a.lbl <> b.lbl THEN 1 ELSE 0 END) = 0
            AS converged
          FROM l5 a JOIN l6 b ON b.cid = a.cid),
        corel AS MATERIALIZED (
          SELECT c.cx, c.cy, c.cid, c.n, l.lbl
          FROM core c JOIN l6 l ON l.cid = c.cid),
        borderl AS MATERIALIZED (
          SELECT nc.cx, nc.cy, MAX(nc.n) AS n, MIN(cl.lbl) AS lbl
          FROM (SELECT ce.cx, ce.cy, ce.n FROM cells ce
                LEFT JOIN core co ON co.cx = ce.cx AND co.cy = ce.cy
                WHERE co.cid IS NULL) nc,
               (SELECT unnest([-1, 0, 1]) AS dx) dx,
               (SELECT unnest([-1, 0, 1]) AS dy) dy,
               corel cl
          WHERE cl.cx = nc.cx + dx.dx AND cl.cy = nc.cy + dy.dy
          GROUP BY 1, 2),
        clus AS MATERIALIZED (
          SELECT k.lbl AS cluster_id,
                 CAST(k.n_core_cells AS BIGINT) AS n_core_cells,
                 CAST(k.n_core_points AS BIGINT) AS n_core_points,
                 CAST(COALESCE(b.n_border_points, 0) AS BIGINT)
                   AS n_border_points
          FROM (SELECT lbl, COUNT(*) AS n_core_cells,
                       SUM(n) AS n_core_points
                FROM corel GROUP BY 1) k
          LEFT JOIN (SELECT lbl, SUM(n) AS n_border_points
                     FROM borderl GROUP BY 1) b ON b.lbl = k.lbl),
        noise AS (
          SELECT CAST(t.nt - COALESCE(
                   (SELECT SUM(n_core_points + n_border_points) FROM clus),
                   0) AS BIGINT) AS n_noise
          FROM tot t)
        SELECT c.cluster_id, c.n_core_cells, c.n_core_points,
               c.n_border_points, noise.n_noise, conv.converged
        FROM clus c CROSS JOIN noise CROSS JOIN conv
        ORDER BY c.cluster_id""")))
}
