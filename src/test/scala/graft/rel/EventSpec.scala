package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Int)*) =
    rows.toSeq
      .map { case (u, ty, t) => (u, ty, new java.sql.Timestamp(t * 1000L)) }
      .toDF("user_id", "event_type", "t")

  test("funnel stages require STRICTLY-after ordering per user") {
    val events = ev(
      // user 1: clean signup -> view -> purchase
      (1L, "signup", 1), (1L, "view", 2), (1L, "purchase", 3),
      // user 2: view BEFORE signup only -> the later purchase can't
      // count (stage 2 was never reached), stage stays 1
      (2L, "view", 1), (2L, "signup", 2), (2L, "purchase", 3),
      // user 3: purchase before the view -> reaches stage 2 only
      (3L, "signup", 1), (3L, "purchase", 2), (3L, "view", 3),
      // user 4: never signs up -> absent from the funnel
      (4L, "view", 1), (4L, "purchase", 2),
      // user 5: view at the SAME instant as signup -> not strictly
      // after, stage stays 1
      (5L, "signup", 1), (5L, "view", 1))
    val got = EventQueries.funnelStages(events, Seq("signup", "view", "purchase"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (2L, 1L), (3L, 2L), (5L, 1L)))
  }

  test("funnel stage time is the EARLIEST qualifying event") {
    // two views after signup: the funnel must chain from the first one
    // (t=2), so the purchase at t=3 (after view#1, before view#2)
    // still completes the funnel
    val events = ev(
      (1L, "signup", 1), (1L, "view", 2), (1L, "view", 9), (1L, "purchase", 3))
    val got = EventQueries.funnelStages(events, Seq("signup", "view", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L)))
  }

  test("single-stage funnel is first-event-per-user") {
    val events = ev((1L, "signup", 5), (1L, "signup", 2), (2L, "view", 1))
    val got = EventQueries.funnelStages(events, Seq("signup"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L)))
  }
}
