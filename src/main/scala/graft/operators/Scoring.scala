package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashing-trick linear text scoring — the classifier-based-filtering
  * primitive (GPT-3/CCNet-style quality gates apply exactly this shape:
  * a fasttext-like linear model over hashed token features). The model
  * IS a table: (bucket, weight). Applying it to a corpus is a map-side
  * tokenize → hash → BROADCAST weights join → per-doc partial-agg sum —
  * no UDF, no shuffle of the corpus, one exchange on the doc key for
  * the final sum. At 100 TB the model rides the closure as a broadcast
  * exactly like any small dim table, and retraining swaps the table
  * without touching the pipeline.
  *
  * Determinism: the feature hash is md5Lower64 (the engine-parity
  * digest), weights are integers (micro-units) — scores are exact
  * BIGINTs any SQL oracle reproduces.
  */
object Scoring {

  /** Score each document: sum of bucket weights of its hashed tokens
    * plus `bias`. `weights` carries (bkt, wgt) and may be SPARSE — a
    * token whose bucket is absent from the model contributes 0 (the
    * fasttext convention), via a LEFT join + coalesce, so a document
    * none of whose tokens hit the model still scores as `bias` instead
    * of silently vanishing from the output. Null text is treated as
    * empty (one empty token), so every input document scores. Token
    * hashing is salted so disjoint models never share feature spaces.
    * Emits the id columns + `score`. */
  def hashedLinearScore(docs: DataFrame, idCols: Seq[String],
      textCol: String, weights: DataFrame, numBuckets: Int, bias: Long,
      salt: String): DataFrame = {
    val toks = docs.select(
      (idCols.map(col) :+ explode(split(coalesce(col(textCol), lit("")),
        " ")).as("__w")): _*)
    val hashed = toks.withColumn("bkt",
      pmod(graft.functions.Kernels.md5Lower64Lo32(
        concat(lit(salt), col("__w"))), lit(numBuckets)))
    hashed.join(broadcast(weights), Seq("bkt"), "left")
      .groupBy(idCols.map(col): _*)
      .agg((sum(coalesce(col("wgt"), lit(0L))) + lit(bias)).as("score"))
  }

  // ── in-engine training ─────────────────────────────────────────────
  // The weights table doesn't have to come from outside: a Laplace-
  // smoothed Naive-Bayes log-odds model over the same hashed features
  // IS a (bucket, weight) table, and its training is two scans + a
  // numBuckets-sized arithmetic pass. Logarithms use an EXACT integer
  // ladder (no transcendentals, no floats), so training is
  // bit-reproducible at any parallelism and a SQL oracle recomputes the
  // identical model.

  /** SQL fragment for the integer micro-log2 ladder
    * `ilog2u(x) = e·10⁶ + (x − 2ᵉ)·10⁶ div 2ᵉ`, `e = ⌊log2 x⌋` taken
    * from the binary-string length — a piecewise-linear log2 in 1e-6
    * units, exact integer arithmetic end to end (2ᵉ via power() is
    * float-exact below 2⁵³; counts stay far under that). Domain x ≥ 1 —
    * callers smooth with +1. `idiv` spells integer division: `div`
    * (Spark) or `//` (DuckDB); everything else is dialect-shared. */
  def ilog2uSql(x: String, idiv: String): String = {
    val e = s"(length(bin($x)) - 1)"
    val p = s"CAST(power(2, $e) AS BIGINT)"
    s"(CAST($e AS BIGINT) * 1000000 + (($x - $p) * 1000000) $idiv $p)"
  }

  /** Train the NB log-odds weights from labeled docs (`labelCol` ∈
    * {0, 1}): per bucket,
    * `wgt = ilog2u(c1+1) − ilog2u(T1+B) − ilog2u(c0+1) + ilog2u(T0+B)`
    * — the Laplace-smoothed log-likelihood ratio in micro-log2 units.
    * Returns a DENSE (bkt, wgt) table over [0, numBuckets) (absent
    * buckets get the pure-smoothing weight), ready for
    * [[hashedLinearScore]] with the same `numBuckets`/`salt`. Plan: one
    * token scan → bucket-keyed partial agg, then numBuckets rows of
    * arithmetic against a broadcast 1-row totals frame — training cost
    * is the scan, model size is the bucket count. */
  def trainNbWeights(docs: DataFrame, textCol: String, labelCol: String,
      numBuckets: Int, salt: String): DataFrame = {
    val toks = docs.select(col(labelCol).cast("int").as("__y"),
      explode(split(coalesce(col(textCol), lit("")), " ")).as("__w"))
    val hashed = toks.select(col("__y"),
      pmod(graft.functions.Kernels.md5Lower64Lo32(
        concat(lit(salt), col("__w"))), lit(numBuckets)).as("bkt"))
    val counts = hashed.groupBy(col("bkt")).agg(
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("c1"),
      sum(when(col("__y") === 1, 0L).otherwise(1L)).as("c0"))
    val dense = docs.sparkSession.range(numBuckets)
      .select(col("id").as("bkt"))
      .join(counts, Seq("bkt"), "left")
      .select(col("bkt"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c0"), lit(0L)).as("c0"))
    val totals = dense.agg(
      (sum(col("c1")) + numBuckets).as("t1"),
      (sum(col("c0")) + numBuckets).as("t0"))
    def lg(x: String) = ilog2uSql(x, "div")
    dense.crossJoin(broadcast(totals))
      .selectExpr("bkt",
        s"${lg("(c1 + 1)")} - ${lg("t1")} - ${lg("(c0 + 1)")} + ${lg("t0")} AS wgt")
  }

  /** The matching prior bias: `ilog2u(n₁) − ilog2u(n₀)` over the
    * labeled doc counts (both must be ≥ 1 — a one-class corpus has no
    * odds to learn). Bounded 1-row action. */
  def trainNbBias(docs: DataFrame, labelCol: String): Long = {
    val r = docs.agg(
      sum(when(col(labelCol).cast("int") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col(labelCol).cast("int") === 1, 0L).otherwise(1L)).as("n0"))
      .selectExpr(
        s"${ilog2uSql("n1", "div")} - ${ilog2uSql("n0", "div")} AS bias",
        "n1", "n0")
      .head()
    require(r.getLong(1) > 0 && r.getLong(2) > 0,
      "trainNbBias: both classes must be present in the labeled docs")
    r.getLong(0)
  }
}
