package graft.tick

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Versioned tick ingestion: the snapshot store wired under the tick
  * data model, so every ingest batch commits a VERSION and any past
  * state stays queryable — `readAsOf(v)` is "the series exactly as
  * they stood after batch v", the reproducibility primitive the
  * plain TickStore (like the reference, which keeps only latest
  * state per key — `node.go:213-246`) cannot answer.
  *
  * Mapping onto the store's (key, part, seq, vc) row model:
  *  - key  = `index|ts_ns|field` — the tick point identity; LWW
  *    across versions IS tick upsert semantics
  *  - part = UTC day of ts_ns — a commit rewrites only the touched
  *    days, untouched days are physically shared between versions
  *    (same partition economics as TickStore's (index, day) layout)
  *  - vc   = the field value in integer cents (exact, hashable)
  *
  * The '|' separator makes decode exact as long as `index` and
  * `field` are '|'-free — enforced at commit, not silently mangled.
  */
object TickVersioned {

  /** Commit a batch of (index STRING, ts_ns LONG, field STRING,
    * vc LONG[, seq LONG]) as the next version; returns it.
    */
  def commit(spark: SparkSession, base: String, batch: DataFrame): Int = {
    val withSeq =
      if (batch.columns.contains("seq")) batch else batch.withColumn("seq", lit(0L))
    val bad = withSeq
      .where(col("index").contains("|") || col("field").contains("|"))
      .limit(1).count()
    require(bad == 0, "index/field must not contain '|' (key separator)")
    SnapshotStore.commit(spark, base, withSeq.select(
      concat_ws("|", col("index"), col("ts_ns").cast("string"), col("field")).as("key"),
      TickStore.dayCol("ts_ns").as("part"),
      col("seq"),
      col("vc")))
  }

  /** The tick rows exactly as of `version`:
    * (index, ts_ns, field, vc, day).
    */
  def readAsOf(spark: SparkSession, base: String, version: Int): DataFrame =
    decode(SnapshotStore.readVersion(spark, base, version))

  /** Ranged time travel: only day partitions in `[fromDay, toDay]`
    * (inclusive, `yyyy-MM-dd` strings compare like dates) reach the
    * scan — pruning happens against the version's manifest, so a
    * 10-year store serves a 3-day as-of query by reading 3 dirs.
    */
  def readAsOfRange(spark: SparkSession, base: String, version: Int,
      fromDay: String, toDay: String): DataFrame =
    decode(SnapshotStore.readVersionWhere(spark, base, version,
      d => d >= fromDay && d <= toDay))

  private def decode(rows: DataFrame): DataFrame =
    rows
      .select(
        split(col("key"), "\\|").as("k"),
        col("part").as("day"),
        col("vc"))
      .select(
        col("k").getItem(0).as("index"),
        col("k").getItem(1).cast("long").as("ts_ns"),
        col("k").getItem(2).as("field"),
        col("vc"),
        col("day"))

  def currentVersion(spark: SparkSession, base: String): Int =
    SnapshotStore.currentVersion(spark, base)
}
