package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.DataFrame

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
  private val memo  = mutable.Map[String, DataFrame]()

  def register(name: String, deps: Seq[String] = Nil)(
      build: Map[String, DataFrame] => DataFrame): this.type = {
    require(!nodes.contains(name), s"duplicate node $name")
    nodes(name) = Node(name, deps, build)
    this
  }

  private def consumerCount(name: String): Int =
    nodes.valuesIterator.count(_.deps.contains(name))

  /** Build (and memoize) a node, resolving deps depth-first. */
  def build(name: String): DataFrame = buildWith(name, Set.empty)

  private def buildWith(name: String, visiting: Set[String]): DataFrame = {
    require(!visiting(name), s"dependency cycle through $name")
    memo.getOrElseUpdate(name, {
      val node = nodes.getOrElse(name, sys.error(s"unknown node $name"))
      val deps = node.deps.map(d => d -> buildWith(d, visiting + name)).toMap
      val df   = node.build(deps)
      if (consumerCount(name) > 1) df.localCheckpoint(true) else df
    })
  }

  /** Build every registered node (dependency order), returning leaves. */
  def buildAll(): Map[String, DataFrame] =
    nodes.keysIterator.map(n => n -> build(n)).toMap
}
