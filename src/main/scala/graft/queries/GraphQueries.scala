package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-4 batch 8 — graph + sequence analytics:
  *
  *  - q108: PageRank over the supplier↔part co-occurrence graph in EXACT
  *    integer arithmetic (micro-unit ranks, floor division), so a fixed
  *    iteration count is bit-reproducible on any engine — the same
  *    determinism stance as the connected-components family (q48/q93).
  *  - q111: first-order Markov transition matrix over per-user event
  *    sequences (the "what happens after a click" behavioral primitive).
  */
object GraphQueries {

  /** One integer-PageRank round: rank/outdeg contributions (floor div)
    * summed over in-edges, damped 0.85 in integer arithmetic:
    * r' = 150000 + (85·Σcontrib) div 100, with ranks in micro-units
    * (1.0 ≡ 1,000,000). Edges/deg shuffle once on the node key; each
    * round is one join + one partial agg — the Pregel superstep shape. */
  private def prRound(ranks: DataFrame, edges: DataFrame, deg: DataFrame): DataFrame =
    ranks.join(deg, "node")
      .selectExpr("node", "r div d AS contrib") // integer div — `/` on longs is double division
      .join(edges, col("node") === col("src"))
      .groupBy(col("dst").as("node2"))
      .agg(sum(col("contrib")).as("csum"))
      .selectExpr("node2 AS node", "CAST(150000 + (85 * csum) div 100 AS BIGINT) AS r")

  val defs: Seq[QueryDef] = Seq(

    // PageRank, 3 fixed rounds, over the bipartite supplier↔part graph
    // (distinct lineitem pairs, symmetrized). Every value stays a BIGINT:
    // floor division for the out-contribution and the damping product, so
    // Spark and DuckDB agree exactly (doubles would drift in summation
    // order). Part nodes are offset by 10^7 to keep the id spaces
    // disjoint at any scale factor. 100 TB story: each round is a
    // co-partitioned join on the node key + one partial agg — the
    // standard Pregel superstep; round count is fixed, plan growth
    // linear, no driver-side state.
    QueryDef(
      "q108_pagerank",
      (s, dir) => {
        val pairs = Tables.lineitem(s, dir)
          .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
        val edges = pairs.select(col("sk").as("src"), (col("pk") + 10000000L).as("dst"))
          .unionByName(pairs.select((col("pk") + 10000000L).as("src"), col("sk").as("dst")))
        val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
        val r0 = deg.select(col("node"), lit(1000000L).as("r"))
        val r3 = (1 to 3).foldLeft(r0)((r, _) => prRound(r, edges, deg))
        r3.select(
            when(col("node") < 10000000L, "supplier").otherwise("part").as("node_type"),
            when(col("node") < 10000000L, col("node"))
              .otherwise(col("node") - 10000000L).as("entity_id"),
            col("r").as("rank_micros"))
          .orderBy(col("rank_micros").desc, col("node_type"), col("entity_id"))
          .limit(20)
      },
      Some("""
        WITH pairs AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
        e AS (
          SELECT sk AS src, 10000000 + pk AS dst FROM pairs
          UNION ALL
          SELECT 10000000 + pk AS src, sk AS dst FROM pairs),
        deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
        c1 AS (SELECT node, r // d AS contrib FROM r0 JOIN deg USING (node)),
        r1 AS (SELECT e.dst AS node,
                      CAST(150000 + (85 * CAST(SUM(c.contrib) AS BIGINT)) // 100 AS BIGINT) AS r
               FROM e JOIN c1 c ON e.src = c.node GROUP BY 1),
        c2 AS (SELECT node, r // d AS contrib FROM r1 JOIN deg USING (node)),
        r2 AS (SELECT e.dst AS node,
                      CAST(150000 + (85 * CAST(SUM(c.contrib) AS BIGINT)) // 100 AS BIGINT) AS r
               FROM e JOIN c2 c ON e.src = c.node GROUP BY 1),
        c3 AS (SELECT node, r // d AS contrib FROM r2 JOIN deg USING (node)),
        r3 AS (SELECT e.dst AS node,
                      CAST(150000 + (85 * CAST(SUM(c.contrib) AS BIGINT)) // 100 AS BIGINT) AS r
               FROM e JOIN c3 c ON e.src = c.node GROUP BY 1)
        SELECT CASE WHEN node < 10000000 THEN 'supplier' ELSE 'part' END AS node_type,
               CASE WHEN node < 10000000 THEN node ELSE node - 10000000 END AS entity_id,
               r AS rank_micros
        FROM r3
        ORDER BY rank_micros DESC, node_type, entity_id
        LIMIT 20""")),

    // First-order Markov transition matrix: per-user event sequences
    // (ordered by ts with event_id tiebreak — the corpus has no
    // guaranteed unique timestamps), lead() to the next event, count
    // every (from → to) cell plus per-from totals. One exchange on
    // user_id (window), then a tiny 25-cell rollup. Sequence-end rows
    // (lead = null) are dropped — they have no transition.
    QueryDef(
      "q111_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val nxt = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
        nxt.groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n_transitions"))
          .withColumn("from_total",
            sum(col("n_transitions")).over(Window.partitionBy(col("from_type"))))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS next_type
          FROM events),
        cells AS (
          SELECT event_type AS from_type, next_type AS to_type,
                 COUNT(*) AS n_transitions
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY 1, 2)
        SELECT from_type, to_type, n_transitions,
               CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT) AS from_total
        FROM cells
        ORDER BY from_type, to_type""")))
}
