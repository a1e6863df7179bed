package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver fixture tables (see TESTDATA.md / FIXTURES.md).
  *
  * Every query in this engine takes an `sfDir` (scale-factor directory) and
  * reads parquet lazily — Catalyst prunes columns and pushes predicates into
  * the scan, so a query that touches 2 columns of `lineitem` reads 2 column
  * chunks, not 11. At 100 TB the same plan holds: the parquet footprint is
  * partition-pruned + column-pruned before any task is scheduled.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Round-robin rebalance to the session's full parallelism. The fixture
    * files are single-row-group parquet — one input split — so any heavy
    * per-row pipeline downstream of a bare scan runs in ONE task. One cheap
    * narrow-row shuffle buys full-width execution; on a real multi-TB
    * table the scan is already split and this becomes a no-op choice. */
  def rebalanced(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos as a
    * raw long (legacy conf) and rebuild a microsecond TimestampType column
    * with integer division — `ts div 1000` keeps full precision (a double
    * division would lose it: 2024 epoch-nanos ≈ 1.7e18 > 2^53). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
