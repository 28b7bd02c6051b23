package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source registry over the driver's parquet star schema
  * (/root/repo/TESTDATA.md). Mirrors the reference's source() lookup
  * (reference models/staging/schema.yml:3-100 resolves (schema, table) →
  * physical table); here (sfDir, name) → parquet path.
  *
  * Scale note: `spark.read.parquet` exposes parquet footers to Catalyst so
  * filter pushdown / column pruning / partition pruning all apply. On a real
  * 100 TB deployment the same call points at a date-partitioned directory
  * tree and nothing else changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects; read as epoch-nanos long and rebuild the timestamp (integer
    // `div` — a double division would lose precision on ~1e18 nanos).
    // Oracle parity: DuckDB also reads TIMESTAMP_NS as µs TIMESTAMP
    // (truncating, same direction for post-1970 data), so both engines see
    // identical µs values by construction — no oracle-side trunc needed.
    // Set-once: repeated conf.set on every load was harmless but mutated
    // session state per call.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        acc.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case (acc, _) => acc
    }
  }

  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
