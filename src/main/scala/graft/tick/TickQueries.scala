package graft.tick

import graft.QueryDef

/** TickDB-parity query surface (SURVEY.md §2.A row A8 + §2.A.1): the
  * range + time-bucket group-by + per-field-reducer operator, exercised
  * over the `events` table at every group level and with every reducer,
  * all oracle-checked against DuckDB.
  *
  * Each entry is the JSON query document the reference would accept
  * (reference README.md:32-44, `query.go:12-18`), decoded by
  * [[TickQuery.fromJson]] and lowered by [[TickQueryExec]] — i.e. the
  * verify path runs the exact production code path from wire format to
  * DataFrame.
  */
object TickQueries {

  /** The reference README's own example shape: avg over 2-minute
    * buckets in a time range on one index (README.md:32-44).
    */
  val flagshipJson: String =
    """{"index": "click",
       |"from": "2024-01-03T00:00:00Z", "to": "2024-01-25T12:30:00Z",
       |"group": "2minutes",
       |"fields": {"value": {"reducer": "avg"}}}""".stripMargin

  private def tickDef(json: String): QueryDef = {
    val q = TickQuery.fromJson(json)
    QueryDef(
      build = (spark, dir) => TickQueryExec.runExact(EventsSource(spark, dir), q),
      oracle = Some(TickQueryExec.oracleSql(EventsSource(null, ""), q)))
  }

  val defs: Map[String, QueryDef] = Map(
    // the README example: 2-minute buckets, avg — honors the multiplier
    // the reference drops (SURVEY §2.A.2 item 2)
    "tick_avg_2min" -> tickDef(flagshipJson),
    // every reducer x a spread of levels (SURVEY §2.A.1)
    "tick_sum_second" -> tickDef(
      """{"index":"view","from":"2024-01-10T00:00:00Z","to":"2024-01-10T06:00:00Z",
         |"group":"second","fields":{"value":{"reducer":"sum"}}}""".stripMargin),
    "tick_sum_minute" -> tickDef(
      """{"index":"purchase","from":"2024-01-02T00:00:00Z","to":"2024-01-28T00:00:00Z",
         |"group":"minute","fields":{"value":{"reducer":"sum"}}}""".stripMargin),
    "tick_max_hour" -> tickDef(
      """{"index":"click","from":"2024-01-01T00:00:00Z","to":"2024-01-31T00:00:00Z",
         |"group":"hour","fields":{"value":{"reducer":"max"}}}""".stripMargin),
    "tick_min_hour" -> tickDef(
      """{"index":"error","from":"2024-01-01T00:00:00Z","to":"2024-01-31T00:00:00Z",
         |"group":"hour","fields":{"value":{"reducer":"min"}}}""".stripMargin),
    "tick_first_day" -> tickDef(
      """{"index":"signup","group":"day","fields":{"value":{"reducer":"first"}}}""".stripMargin),
    "tick_last_day" -> tickDef(
      """{"index":"signup","group":"day","fields":{"value":{"reducer":"last"}}}""".stripMargin),
    "tick_count_minute" -> tickDef(
      """{"index":"view","from":"2024-01-05T00:00:00Z","to":"2024-01-20T00:00:00Z",
         |"group":"5minutes","fields":{"value":{"reducer":"count"}}}""".stripMargin),
    "tick_avg_day" -> tickDef(
      """{"index":"purchase","group":"day","fields":{
         |"value":{"reducer":"avg"}}}""".stripMargin),
    "tick_month_rollup" -> tickDef(
      """{"index":"click","group":"month","fields":{"value":{"reducer":"sum"}}}""".stripMargin),
    "tick_year_rollup" -> tickDef(
      """{"index":"click","group":"year","fields":{"value":{"reducer":"count"}}}""".stripMargin),
    // json side-field via props (FIXTURES.md: props exercises from_json)
    "tick_props_field" -> tickDef(
      """{"index":"error","from":"2024-01-01T00:00:00Z","to":"2024-02-01T00:00:00Z",
         |"group":"day","fields":{"k":{"reducer":"avg"}}}""".stripMargin),
    // the canonical TSDB candle: open/high/low/close/volume per day in
    // one pass — the reference's per-pointer Value struct (node.go:39-46)
    // as a single grouped aggregation
    "tick_ohlc_daily" -> QueryDef(
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |  MIN_BY("value", ts) AS open, MAX("value") AS high,
        |  MIN("value") AS low, MAX_BY("value", ts) AS close,
        |  COUNT("value") AS volume
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val src = EventsSource(s, d)
      src.frame.where(src.indexPredicate("purchase"))
        .groupBy(date_trunc("day", src.ts).as("bucket"))
        .agg(
          min_by(src.field("value"), src.ts).as("open"),
          max(src.field("value")).as("high"),
          min(src.field("value")).as("low"),
          max_by(src.field("value"), src.ts).as("close"),
          count(src.field("value")).as("volume"))
        .orderBy("bucket")
    },

    // raw-level (no group): ordered point scan with projection
    "tick_raw_points" -> tickDef(
      """{"index":"signup","from":"2024-01-15T00:00:00Z","to":"2024-01-15T12:00:00Z",
         |"fields":{"value":{"reducer":"last"}}}""".stripMargin)
  )
}
