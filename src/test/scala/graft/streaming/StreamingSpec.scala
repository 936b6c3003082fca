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

  test("watermarked append-mode agg withholds windows newer than the watermark") {
    val emitted = StreamingOps.watermarkedCounts(spark, sf0001, "1 day")
    val batchDays = graft.Tables.events(spark, sf0001)
      .select(date_trunc("day", col("ts"))).distinct().count()
    // append mode can only finalize windows older than max(ts) - 1 day:
    // strictly fewer emitted windows than exist in the data
    assert(emitted.count() < batchDays)
  }
}
