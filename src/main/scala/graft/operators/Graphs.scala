package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators beyond the connected-components family
  * (TextDedup.connectedComponents): k-core decomposition by parallel
  * peeling. Same loop discipline as CC — localCheckpoint(eager) per
  * round keeps the plan constant-size and the loop pin-neutral
  * (no cacheManager entries), and the convergence probe reads
  * materialized blocks, not lineage.
  */
object Graphs {

  /** k-core: the maximal induced subgraph where every node has degree
    * ≥ k. Parallel peeling — drop all nodes below k, recompute induced
    * degrees, repeat to fixpoint. Survivor sets shrink monotonically, so
    * an unchanged node COUNT is an unchanged node SET, which makes the
    * count probe a sound fixpoint test. Each round is two co-partitioned
    * semi-joins on the edge key + one partial-agg — the Pregel superstep
    * shape; round count is bounded by the peeling depth (degeneracy
    * ordering length), not node count.
    *
    * `edges` must be symmetric (both directions present) with no
    * self-loops, columns `src`/`dst`. Returns (nodes with their induced
    * core degree, rounds executed).
    */
  def kCoreWithRounds(edges: DataFrame, k: Int,
      maxRounds: Int = 64): (DataFrame, Int) = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .where(col("deg") >= k)
      .localCheckpoint(true)
    var cnt = deg.count()
    var rounds = 0
    var converged = cnt == 0L
    while (!converged && rounds < maxRounds) {
      val nxt = e
        .join(deg.select(col("node").as("src")), Seq("src"))
        .join(deg.select(col("node").as("dst")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .localCheckpoint(true)
      val n = nxt.count()
      converged = n == cnt
      deg = nxt
      cnt = n
      rounds += 1
    }
    (deg, rounds)
  }

  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame =
    kCoreWithRounds(edges, k, maxRounds)._1
}
