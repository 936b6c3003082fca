package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Both branches of the adaptive events loader stay exercised no matter
  * which schema generation the driver's testdata currently has:
  *  - LONG `ts`: what `nanosAsLong` surfaces for a TIMESTAMP(NANOS)
  *    file (Spark cannot WRITE nanos parquet, so the fixture writes the
  *    post-read long view directly — the loader's input is identical);
  *  - timestamp[us] `ts` (TIMESTAMP_NTZ): the current driver encoding.
  * Same rows in both fixtures; the loader must normalize both to the
  * same (ts_ns LONG exact, ts TIMESTAMP µs) surface.
  */
class TablesEventsVariantsSpec extends SparkSpec {

  // 2024-01-05 12:00:00.123456 UTC in µs, plus a sub-µs ns tail for the
  // nanos fixture (truncates away in ts, survives in ts_ns)
  private val baseUs = 1704456000123456L

  private def rows(nsTail: Long) = Seq(
    (1L, baseUs * 1000L + nsTail, 10L, "click", 1.5, """{"k":1}"""),
    (2L, (baseUs + 1000000L) * 1000L + nsTail, 11L, "view", 2.5, """{"k":2}"""))

  private def writeDir(): String =
    Files.createTempDirectory("graft_events_variant").toString

  test("LONG-nanos ts file takes the nanos branch") {
    val dir = writeDir()
    spark.createDataFrame(rows(nsTail = 789L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir).orderBy("event_id")
    assert(ev.schema("ts_ns").dataType == LongType)
    assert(ev.schema("ts").dataType == TimestampType)
    val r = ev.select("ts_ns", "ts").collect()
    assert(r(0).getLong(0) == baseUs * 1000L + 789L)   // exact ns kept
    assert(r(0).getTimestamp(1).getTime % 1000 == 123L) // ms part of µs ts
    assert(ev.where(expr("unix_micros(ts) != ts_ns DIV 1000")).count() == 0)
  }

  test("timestamp_ntz ts file takes the µs branch with identical surface") {
    val dir = writeDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows(nsTail = 0L).map { case (id, ns, u, t, v, p) =>
      Row(id, java.time.LocalDateTime.ofEpochSecond(
        ns / 1000000000L, (ns % 1000000000L).toInt, java.time.ZoneOffset.UTC),
        u, t, v, p)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir).orderBy("event_id")
    assert(ev.schema("ts_ns").dataType == LongType)
    assert(ev.schema("ts").dataType == TimestampType)
    val r = ev.select("ts_ns", "ts").collect()
    assert(r(0).getLong(0) == baseUs * 1000L)
    assert(r(1).getLong(0) == (baseUs + 1000000L) * 1000L)
    assert(ev.where(expr("unix_micros(ts) * 1000 != ts_ns")).count() == 0)
  }

  test("both variants yield identical query results") {
    val dirNs = writeDir(); val dirUs = writeDir()
    spark.createDataFrame(rows(nsTail = 0L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirNs/events.parquet")
    Tables.events(spark, dirNs) // sanity: loads
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows(nsTail = 0L).map { case (id, ns, u, t, v, p) =>
      Row(id, java.time.LocalDateTime.ofEpochSecond(
        ns / 1000000000L, (ns % 1000000000L).toInt, java.time.ZoneOffset.UTC),
        u, t, v, p)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
      .write.mode("overwrite").parquet(s"$dirUs/events.parquet")
    def agg(dir: String) = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("ts").as("mx"), max("ts_ns").as("mxn"))
      .orderBy("event_type").collect().toSeq
    assert(agg(dirNs) == agg(dirUs))
  }
}
