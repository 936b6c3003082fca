package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import Sessionize._

class SessionizeSpec extends SparkSpec {

  private val gapUs = 1800000000L // 30 min

  test("batch sessionization splits at inactivity gaps") {
    import spark.implicits._
    val us = (m: Long) => m * 60000000L
    val events = Seq(
      (1L, us(0), 1.0), (1L, us(10), 2.0),   // session A
      (1L, us(120), 3.0),                     // session B (110-min gap)
      (2L, us(5), 4.0)                        // user 2, one session
    ).toDF("user_id", "us", "value")
      .selectExpr("user_id", "timestamp_micros(us) AS ts", "value")
    val got = Sessionize.batch(events, gapUs)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }

  test("stateful streaming sessions carry state across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val us = (m: Long) => m * 60000000L
    val in = MemoryStream[SessionEvent]
    val q = Sessionize.streamingSessions(in.toDS(), gapUs)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    // batch 1: open a session, then a gap closes it and opens another
    in.addData(SessionEvent(1, us(0), 1.0), SessionEvent(1, us(10), 2.0),
      SessionEvent(1, us(120), 3.0))
    q.processAllAvailable()
    val afterB1 = spark.table("sessions_out").as[Session].collect().toSeq
    assert(afterB1 == Seq(Session(1, us(0), 2, 3.0)),
      "first session closes when the gap arrives; second stays open in state")
    // batch 2: extend the open session across the batch boundary, then close it
    in.addData(SessionEvent(1, us(130), 4.0), SessionEvent(1, us(400), 9.0))
    q.processAllAvailable()
    val afterB2 = spark.table("sessions_out").as[Session].collect().toSeq
    assert(afterB2.contains(Session(1, us(120), 2, 7.0)),
      "open session extended by batch 2's first event, then closed by the gap")
    q.stop()
  }

  test("streaming closed sessions equal batch sessions minus each user's open tail") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "value").as[SessionEvent]
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = Sessionize.streamingSessions(in.toDS(), gapUs)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_real").start()
    in.addData(ev.collect().toIndexedSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("sessions_real").as[Session]
      .collect().map(s => (s.user_id, s.session_start, s.n_events)).toSet
    q.stop()
    val batchAll = Sessionize.batch(
      graft.Tables.events(spark, sf0001), gapUs)
      .selectExpr("user_id", "unix_micros(session_start)", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lastPerUser = batchAll.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    assert(streamed == batchAll.toSet -- lastPerUser,
      "closed streaming sessions == batch sessions minus each user's final (still-open) one")
  }
}
