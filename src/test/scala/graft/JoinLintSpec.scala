package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Suite-wide Cartesian lint: a CartesianProductExec materializes
  * |left|×|right| rows with NO broadcast and NO key — at 100 TB it is
  * never the right plan. Legitimate cross joins in this repo are all
  * broadcast-one-row (totals/constants → BroadcastNestedLoopJoin over a
  * 1-row build side) or bounded probe sets; anything that degrades to
  * CartesianProductExec must be listed here with its justification or
  * fixed. Streaming queries are excluded (their fn executes lifetimes).
  */
class JoinLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** query -> max allowed CartesianProductExec nodes, each justified. */
  private val allow: Map[String, Int] = Map.empty

  test("no batch query plans a non-broadcast cartesian product") {
    val streaming = graft.queries.StreamQueries.defs.map(_.name).toSet
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.allDefs.filterNot(d => streaming(d.name)).foreach { d =>
      val carts = d.fn(spark, dir).queryExecution.executedPlan.collect {
        case c: CartesianProductExec => c
      }
      val cap = allow.getOrElse(d.name, 0)
      if (carts.size > cap)
        offenders += s"${d.name}: ${carts.size} CartesianProductExec (allowed $cap)"
    }
    assert(offenders.isEmpty,
      "non-broadcast cartesian products (|l|x|r| row materialization at " +
        "scale):\n" + offenders.mkString("\n"))
  }
}
