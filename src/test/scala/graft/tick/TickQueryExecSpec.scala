package graft.tick

import graft.SparkSpec

class TickQueryExecSpec extends SparkSpec {

  private def run(json: String) =
    TickQueryExec.run(EventsSource(spark, sf0001), TickQuery.fromJson(json))

  test("flagship: 2-minute avg buckets are ordered, in range, non-empty") {
    val rows = run(TickQueries.flagshipJson).collect()
    assert(rows.nonEmpty)
    val buckets = rows.map(_.getTimestamp(0))
    assert(buckets.sameElements(buckets.sorted[java.sql.Timestamp](Ordering.ordered)))
    // honors [from, to): all buckets within range (fix of SURVEY 2.A.2 item 1)
    assert(buckets.head.getTime >= java.time.Instant.parse("2024-01-03T00:00:00Z").toEpochMilli)
    assert(buckets.last.getTime < java.time.Instant.parse("2024-01-25T12:30:00Z").toEpochMilli)
    // 2-minute alignment: epoch millis divisible by 120_000
    assert(buckets.forall(b => b.getTime % 120000L == 0L))
  }

  test("to-bound is honored (the reference drops it)") {
    val all = run("""{"index":"click","group":"day","fields":{"value":{"reducer":"count"}}}""")
    val bounded = run(
      """{"index":"click","to":"2024-01-05T00:00:00Z","group":"day",
        |"fields":{"value":{"reducer":"count"}}}""".stripMargin)
    assert(bounded.count() < all.count())
  }

  test("group multiplier is honored: 2-minute buckets are coarser than 1-minute") {
    val one = run("""{"index":"view","group":"minute","fields":{"value":{"reducer":"sum"}}}""").count()
    val two = run("""{"index":"view","group":"2minutes","fields":{"value":{"reducer":"sum"}}}""").count()
    assert(two <= one)
  }

  test("raw-level query returns individual points in ts order") {
    val df = run("""{"index":"signup","fields":{"value":{"reducer":"last"}}}""")
    assert(df.columns.toSeq == Seq("ts", "value"))
    val n = df.count()
    val evn = graft.Tables.events(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("event_type") === "signup").count()
    assert(n == evn)
  }

  test("count reducer is a real count (reference returns `last`)") {
    val rows = run(
      """{"index":"error","group":"year","fields":{"value":{"reducer":"count"}}}""").collect()
    val total = rows.map(_.getLong(1)).sum
    val expected = graft.Tables.events(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("event_type") === "error").count()
    assert(total == expected)
  }
}
