package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: Spark implementation + optional DuckDB
  * oracle SQL (ANSI, runs against the same parquet registered as bare table
  * names). `oracle = None` → the driver records a weaker rows-only check.
  *
  * Determinism contract (driver hash-compares values): every query ends in
  * a total ORDER BY on both sides, aggregates over doubles go through exact
  * decimal sums (or bit-stable double division), and integer outputs are
  * cast to BIGINT to match DuckDB's default integer width.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
