package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Mini pipeline DAG runner with memoized shared dependencies — the
  * reference's dbt DAG shape re-expressed for Spark (reference: stg_orders
  * feeds fct_orders, fct_customer_monthly_revenue, dim_orders and
  * customer_revenue_ltv — four consumers of one staging model).
  *
  * Each node declares (deps, build); `build` receives already-built dep
  * frames. A node with more than one registered consumer is materialized
  * ONCE via `localCheckpoint(eager)`, so its plan runs once per pipeline
  * run instead of once per consumer — on a cluster this is the difference
  * between scanning bronze N times and once. localCheckpoint (vs persist)
  * also truncates lineage and registers NOTHING in the session
  * cacheManager, so pipelines are pin-neutral: a suite running many
  * catalog queries accumulates zero cache entries (Verify reports this
  * invariant per query), and block cleanup is automatic when the frames
  * go out of scope. On a multi-executor cluster where executor loss
  * mid-pipeline matters, swap for a reliable `checkpoint` dir — same
  * contract. Single-consumer nodes stay lazy (Catalyst inlines them into
  * the consumer's plan, preserving whole-plan optimization across the
  * node boundary).
  */
final class Pipeline {

  private final case class Node(
      name: String, deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame)

  private val nodes = mutable.LinkedHashMap[String, Node]()
  // memo value: (frame, materialized?) — a lazily-memoized frame can be
  // upgraded to materialized by a later build whose subgraph shares it
  private val memo  = mutable.Map[String, (DataFrame, Boolean)]()

  def register(name: String, deps: Seq[String] = Nil)(
      build: Map[String, DataFrame] => DataFrame): this.type = {
    require(!nodes.contains(name), s"duplicate node $name")
    nodes(name) = Node(name, deps, build)
    this
  }

  private def consumerCount(name: String): Int =
    nodes.valuesIterator.count(_.deps.contains(name))

  /** In-degree of every node within the dependency subgraph of `root`.
    * Materialization keys off THIS, not the catalog-wide consumer count:
    * a staging model with five registered consumers is still built lazily
    * when the demanded lineage uses it once (checkpointing it there would
    * pay a full materialization for zero reuse — measured 8 s → 4.5 s on
    * the q56 five-model chain). */
  private def demandCounts(root: String): Map[String, Int] = {
    require(nodes.contains(root), s"unknown node $root")
    val counts = mutable.Map[String, Int]().withDefaultValue(0)
    val seen = mutable.Set[String]()
    def visit(n: String): Unit =
      nodes.getOrElse(n, sys.error(s"unknown node $n")).deps.foreach { d =>
        counts(d) += 1
        if (seen.add(d)) visit(d)
      }
    visit(root)
    counts.toMap
  }

  /** Build (and memoize) a node, resolving deps depth-first; shared nodes
    * are shared within this target's demanded subgraph. */
  def build(name: String): DataFrame =
    buildWith(name, Set.empty, demandCounts(name))

  private def buildWith(name: String, visiting: Set[String],
      demand: Map[String, Int]): DataFrame = {
    require(!visiting(name), s"dependency cycle through $name")
    val wantMat = demand.getOrElse(name, 0) > 1
    memo.get(name) match {
      case Some((df, mat)) if mat || !wantMat => df
      case Some((df, _)) => // lazy from an earlier build; now shared → upgrade
        val m = df.cutLineage()
        memo(name) = (m, true)
        m
      case None =>
        val node = nodes.getOrElse(name, sys.error(s"unknown node $name"))
        val deps = node.deps.map(d => d -> buildWith(d, visiting + name, demand)).toMap
        val df   = node.build(deps)
        val out  = if (wantMat) (df.cutLineage(), true) else (df, false)
        memo(name) = out
        out._1
    }
  }

  /** Build every registered node (dependency order), returning leaves.
    * Demand here is the catalog-wide consumer count (everything is
    * demanded), so multi-consumer nodes materialize exactly once. */
  def buildAll(): Map[String, DataFrame] = {
    val demand = nodes.keysIterator.map(n => n -> consumerCount(n)).toMap
    nodes.keysIterator.map(n => n -> buildWith(n, Set.empty, demand)).toMap
  }
}
