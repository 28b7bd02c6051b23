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
}
