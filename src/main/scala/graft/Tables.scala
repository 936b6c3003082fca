package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md).
  *
  * All loaders are plain parquet scans so Catalyst's pushdown/pruning
  * applies; the only special case is `events`, whose `ts` column has
  * shipped in two physical encodings across testdata generations:
  * TIMESTAMP(NANOS) (unreadable natively by Spark 4 — read as LONG via
  * `spark.sql.legacy.parquet.nanosAsLong`) and plain `timestamp[us]`
  * (read as TIMESTAMP_NTZ). [[Tables.events]] detects which one the
  * file is and normalizes both to the same surface:
  *   - `ts_ns` LONG: exact nanosecond key (the reference keys points by
  *     int64 unix-ns, `storage/point.go:8-11`), and
  *   - `ts` TIMESTAMP: microsecond precision, identical to how DuckDB
  *     (the oracle) reads the same file. Sessions run with
  *     `spark.sql.session.timeZone=UTC`, so the NTZ→TIMESTAMP cast is
  *     a no-op on the underlying micros.
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
  /** `documents`, with a loud guard on the one schema hazard that fails
    * SILENTLY otherwise: the four streaming gates read this table back
    * through file-source `readStream` with `n_chars` declared LongType,
    * and a parquet file whose physical `n_chars` is int32 (ScaleGen
    * slices generated before the r14 int64 fix) yields NULLs under a
    * mismatched declared schema instead of erroring. Batch reads widen
    * int32→int64 fine, so the guard is the only place a stale slice
    * announces itself before a gate quietly drops every row.
    */
  def documents(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "documents")
    df.schema.find(_.name == "n_chars").foreach { f =>
      require(f.dataType == org.apache.spark.sql.types.LongType,
        s"$d/documents.parquet: n_chars is ${f.dataType.simpleString}, expected bigint — " +
          "stale pre-r14 ScaleGen slice; regenerate with graft.ScaleGen (streaming " +
          "readStream schemas declare n_chars LongType and would read NULLs silently)")
    }
    df
  }
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts_ns` (LONG, exact) and `ts` (TimestampType, µs),
    * whatever the physical encoding of the file's `ts` column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) file surfaced as LONG nanos
        raw.withColumnRenamed("ts", "ts_ns")
          // integer DIV, not fp division: ns epochs (~1.7e18) exceed 2^53
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      case _ =>
        // timestamp[us] file. Re-read with `ts` DECLARED TimestampType:
        // the scan itself then yields TIMESTAMP (no cast sitting above
        // it), so `ts` predicates remain pushable parquet filters.
        // Same column order as the nanos branch: event_id, ts_ns, …, ts
        import org.apache.spark.sql.types._
        val s = StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampType),
          StructField("user_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType),
          StructField("props", StringType)))
        spark.read.schema(s).parquet(s"$dir/events.parquet")
          .select(
            col("event_id"),
            (unix_micros(col("ts")) * 1000L).as("ts_ns"),
            col("user_id"), col("event_type"), col("value"), col("props"),
            col("ts"))
    }
  }
}
