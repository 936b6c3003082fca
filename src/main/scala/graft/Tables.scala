package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md).
  *
  * All loaders are plain parquet scans so Catalyst's pushdown/pruning
  * applies; the only special case is `events`, whose `ts` column is
  * nanosecond-precision parquet (TIMESTAMP(NANOS)) that Spark 4 cannot
  * read natively — it is read as LONG nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and surfaced as
  *   - `ts_ns` LONG: exact nanosecond key (the reference keys points by
  *     int64 unix-ns, `storage/point.go:8-11`), and
  *   - `ts` TIMESTAMP: microsecond truncation, identical to how DuckDB
  *     (the oracle) reads the same file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts_ns` (LONG, exact) and `ts` (TimestampType, µs). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      // integer DIV, not fp division: ns epochs (~1.7e18) exceed 2^53
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
  }
}
