package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tick.TickStore

class StreamingSpec extends SparkSpec {

  test("streaming window agg equals the batch equivalent") {
    val streamed = StreamingOps.windowAggOnce(spark, sf0001)
      .orderBy("bucket", "event_type").collect()
    val batch = graft.Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("total"))
      .orderBy("bucket", "event_type").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("foreachBatch streaming ingest upserts into the TickStore") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    def writeJson(name: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes)
    }
    writeJson("batch1.json", Seq(
      """{"index":"ix","time":"2024-05-01T10:00:00Z","value":{"open":1.0}}""",
      """{"index":"ix","time":"2024-05-01T10:01:00Z","value":{"open":2.0}}"""))
    val root = s"${sys.props("java.io.tmpdir")}/graft_test_streaming"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(rp, true)
    val store = new TickStore(root)
    store.createDb(spark, "db")
    StreamingOps.ingestStreamOnce(spark, dir, store, "db")
    assert(store.read(spark, "db").count() == 2)
    // second file: upsert same key last-wins
    writeJson("batch2.json", Seq(
      """{"index":"ix","time":"2024-05-01T10:00:00Z","value":{"open":9.0}}"""))
    StreamingOps.ingestStreamOnce(spark, dir, store, "db")
    val ns = java.time.Instant.parse("2024-05-01T10:00:00Z").getEpochSecond * 1000000000L
    assert(store.get(spark, "db", "ix", ns).contains(Map("open" -> 9.0)))
    assert(store.read(spark, "db").count() == 2)
  }

  test("streamed ingest maintains the rollup tier incrementally") {
    // the reference maintains its aggregation pyramid at insert time
    // (node.go:523-579); here the same behavior over the wire:
    // foreachBatch ingest -> TickStore.ingest -> Rollup.refresh on the
    // touched (index, day) partitions — then a routed rollup query must
    // equal the raw-points answer, including a last-wins overwrite.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_rollup").toString
    def writeJson(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), lines.mkString("\n").getBytes)
    val root = s"${sys.props("java.io.tmpdir")}/graft_test_stream_rollup"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(rp, true)
    val store = new TickStore(root)
    store.createDb(spark, "db")

    writeJson("batch1.json", Seq(
      """{"index":"ix","time":"2024-05-01T10:00:10Z","value":{"open":1.0}}""",
      """{"index":"ix","time":"2024-05-01T10:00:40Z","value":{"open":3.0}}""",
      """{"index":"ix","time":"2024-05-02T11:30:00Z","value":{"open":5.0}}"""))
    StreamingOps.ingestStreamOnce(spark, dir, store, "db")
    graft.tick.Rollup.materialize(spark, store, "db")

    // second micro-batch: a brand-new minute bucket on a new day plus a
    // last-wins overwrite of an existing key — both must flow into the
    // already-materialized rollups via the ingest-time refresh
    writeJson("batch2.json", Seq(
      """{"index":"ix","time":"2024-05-03T09:15:00Z","value":{"open":7.0}}""",
      """{"index":"ix","time":"2024-05-01T10:00:40Z","value":{"open":9.0}}"""))
    StreamingOps.ingestStreamOnce(spark, dir, store, "db")

    val q = graft.tick.TickQuery.fromJson(
      """{"index":"ix","group":"1minute","fields":{"open":{"reducer":"avg"}}}""")
    assert(graft.tick.Rollup.routable(q).isDefined)
    val routed = store.query(spark, "db", q).collect()
    val raw = store.query(spark, "db", q, useRollups = false).collect()
    assert(routed.toSeq == raw.toSeq,
      s"rollup-routed answer diverged from raw after streamed ingest:\n" +
        s"routed=${routed.toSeq}\nraw=${raw.toSeq}")
    // the overwritten minute reflects last-wins ((1.0 + 9.0) / 2), and
    // the streamed-in new bucket is present
    val byBucket = routed.map(r => r.getTimestamp(0).toInstant.toString -> r.getDouble(1)).toMap
    assert(byBucket("2024-05-01T10:00:00Z") == 5.0)
    assert(byBucket("2024-05-03T09:15:00Z") == 7.0)
    // 3 minute buckets: the overwritten 10:00, day-2's 11:30, day-3's 09:15
    assert(routed.length == 3)
  }

  test("versioned streamed ingest: every micro-batch is a queryable snapshot") {
    val (base, nv) = StreamingOps.versionedIngestOnce(spark, sf0001)
    assert(nv == 4, s"4 staged files must drain as 4 commits, got $nv")
    // every intermediate version reads back, counts strictly grow
    // (keys are unique per event, so each batch only adds rows), and
    // the head equals the raw series
    val counts = (1 to nv).map(v =>
      graft.tick.TickVersioned.readAsOf(spark, base, v).count())
    assert(counts.zip(counts.tail).forall { case (a, b) => a < b },
      s"snapshot counts must be strictly increasing: $counts")
    val raw = graft.Tables.events(spark, sf0001)
      .where(col("event_type") === "error").count()
    assert(counts.last == raw, s"head snapshot ${counts.last} != raw $raw")
  }

  test("watermarked append-mode agg withholds windows newer than the watermark") {
    val emitted = StreamingOps.watermarkedCounts(spark, sf0001, "1 day")
    val batchDays = graft.Tables.events(spark, sf0001)
      .select(date_trunc("day", col("ts"))).distinct().count()
    // append mode can only finalize windows older than max(ts) - 1 day:
    // strictly fewer emitted windows than exist in the data
    assert(emitted.count() < batchDays)
  }
}
