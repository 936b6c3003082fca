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
         |"fields":{"value":{"reducer":"last"}}}""".stripMargin),

    // linearly-interpolated resample: the gap-fill sibling where
    // missing buckets take prev + (next - prev) * elapsed-fraction
    // instead of a flat ffill (edge gaps fall back to the one known
    // neighbor). Same scale shape as tick_gap_fill: dense per-series
    // axis broadcast against the hourly aggregate, ordered windows
    // only over axis rows, never points. Every interpolation input is
    // IEEE-exact (+,-,*,/ on identically-ordered doubles), so the
    // oracle matches bit for bit.
    "tick_interp" -> QueryDef(
      """WITH buckets AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
        |                                TIMESTAMP '2024-01-06 23:00:00',
        |                                INTERVAL 1 HOUR)) AS bucket
        |), types AS (
        |  SELECT DISTINCT event_type FROM events WHERE event_type IN ('click', 'error')
        |), axis AS (
        |  SELECT event_type, bucket FROM types CROSS JOIN buckets
        |), agg AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS b,
        |    CAST(SUM(CAST("value" AS DECIMAL(20,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v
        |  FROM events WHERE event_type IN ('click', 'error') GROUP BY 1, 2
        |), j AS (
        |  SELECT a.event_type, a.bucket, agg.v
        |  FROM axis a LEFT JOIN agg ON agg.event_type = a.event_type AND agg.b = a.bucket
        |), f AS (
        |  SELECT event_type, bucket, v,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS pt,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS nt
        |  FROM j
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT event_type, bucket,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (CAST(epoch_us(bucket) - epoch_us(pt) AS DOUBLE)
        |                              / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
        |  END AS v_interp,
        |  (v IS NULL) AS was_gap
        |FROM f ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val agg = graft.Tables.events(s, d)
        .where(col("event_type").isin("click", "error"))
        .groupBy(col("event_type").as("a_type"), date_trunc("hour", col("ts")).as("b"))
        .agg((sum(col("value").cast("decimal(20,4)")).cast("double")
          / count(lit(1)).cast("double")).as("v"))
      val buckets = s.range(1).select(explode(sequence(
        lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
        lit(java.sql.Timestamp.valueOf("2024-01-06 23:00:00")),
        expr("interval 1 hour"))).as("bucket"))
      val axis = graft.Tables.events(s, d)
        .where(col("event_type").isin("click", "error"))
        .select("event_type").distinct()
        .crossJoin(buckets)
      val wp = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val f = axis
        .join(broadcast(agg),
          col("a_type") === col("event_type") && col("b") === col("bucket"), "left")
        .select(col("event_type"), col("bucket"), col("v"))
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
        .withColumn("pt", last(when(col("v").isNotNull, col("bucket")), ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
        .withColumn("nt", first(when(col("v").isNotNull, col("bucket")), ignoreNulls = true).over(wf))
      f.select(col("event_type"), col("bucket"),
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((unix_micros(col("bucket")) - unix_micros(col("pt"))).cast("double")
                / (unix_micros(col("nt")) - unix_micros(col("pt"))).cast("double")))
            .as("v_interp"),
          col("v").isNull.as("was_gap"))
        .orderBy("event_type", "bucket")
    },

    // gap-filled resample: a dense hourly bucket axis (sequence +
    // explode), left-joined to the sparse hourly aggregate, forward-
    // filled with last-non-null. The bucket axis is tiny relative to
    // the data (one row per hour), so it broadcasts; the only ordered
    // pass is the ffill window over the axis itself, never the points.
    "tick_gap_fill" -> QueryDef(
      """WITH buckets AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
        |                                TIMESTAMP '2024-01-06 23:00:00',
        |                                INTERVAL 1 HOUR)) AS bucket
        |), agg AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS b,
        |    CAST(SUM(CAST("value" AS DECIMAL(20,4))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'error' GROUP BY 1
        |)
        |SELECT bucket,
        |  last_value(v IGNORE NULLS) OVER (
        |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
        |FROM buckets LEFT JOIN agg ON b = bucket
        |ORDER BY bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val agg = graft.Tables.events(s, d)
        .where(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("b"))
        .agg((sum(col("value").cast("decimal(20,4)")).cast("double")
          / count(lit(1)).cast("double")).as("v"))
      val buckets = s.range(1).select(explode(sequence(
        lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
        lit(java.sql.Timestamp.valueOf("2024-01-06 23:00:00")),
        expr("interval 1 hour"))).as("bucket"))
      val w = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      buckets.join(broadcast(agg), col("b") === col("bucket"), "left")
        .select(col("bucket"),
          last(col("v"), ignoreNulls = true).over(w).as("value_ffill"))
        .orderBy("bucket")
    },

    // discrete derivative: per-series hourly close, then delta and
    // per-second rate vs the previous bucket (PromQL delta/rate shape).
    // One shuffle for the hourly agg; the lag runs per series on the
    // already-tiny bucket rows.
    "tick_delta_rate" -> QueryDef(
      """WITH hourly AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY("value", ts) AS v
        |  FROM events WHERE event_type IN ('click', 'error') GROUP BY 1, 2
        |)
        |SELECT event_type, bucket, v,
        |  v - LAG(v) OVER (PARTITION BY event_type ORDER BY bucket) AS delta,
        |  (v - LAG(v) OVER (PARTITION BY event_type ORDER BY bucket)) / 3600.0 AS rate_per_sec
        |FROM hourly ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val hourly = graft.Tables.events(s, d)
        .where(col("event_type").isin("click", "error"))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(max_by(col("value"), col("ts_ns")).as("v"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
      hourly.select(
        col("event_type"), col("bucket"), col("v"),
        (col("v") - lag("v", 1).over(w)).as("delta"),
        ((col("v") - lag("v", 1).over(w)) / lit(3600.0)).as("rate_per_sec"))
        .orderBy("event_type", "bucket")
    },

    // exponentially-weighted moving average over the minute-resampled
    // series (half-life smoothing, the TSDB trend line). Decay is
    // pinned at 1/2 so every weight is a power of two: weight apply and
    // normalizer are then IEEE-EXACT (scaling by 2^-k and division are
    // correctly rounded), and the weighted sum is a left fold over the
    // window list in bucket order on BOTH engines (aggregate() here,
    // list_reduce there) — bit-identical with no rounding scaffolding.
    // Scale shape: one shuffle for the minute agg, then an ordered
    // window per series over the already-aggregated buckets.
    "tick_ewma" -> QueryDef(
      """WITH m AS (
        |  SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS bucket,
        |    CAST(SUM(CAST("value" AS DECIMAL(20,4))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |), l AS (
        |  SELECT bucket, v, list(v) OVER (
        |    ORDER BY bucket ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
        |  FROM m
        |)
        |SELECT bucket, v,
        |  list_reduce(list_transform(xs,
        |      (x, i) -> x / CAST(1 << (len(xs) - i) AS DOUBLE)), (a, c) -> a + c)
        |    / (2.0 - 1.0 / CAST(1 << (len(xs) - 1) AS DOUBLE)) AS ewma
        |FROM l ORDER BY bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val minute = graft.Tables.events(s, d)
        .where(col("event_type") === "click")
        .groupBy(date_trunc("minute", col("ts")).as("bucket"))
        .agg((sum(col("value").cast("decimal(20,4)")).cast("double")
          / count(lit(1)).cast("double")).as("v"))
      // single filtered series -> one ordered partition here; a
      // multi-series caller partitions by the series key instead
      val w = Window.orderBy("bucket").rowsBetween(-19, 0)
      // weight for the i-th of n window values (1-based, oldest first)
      // is 2^-(n-i): newest 1, halving backwards — mirrors the DuckDB
      // lambda above index-for-index. SQL-expression shiftleft: the
      // Scala functions.shiftleft only takes a constant shift amount.
      val num = expr(
        """aggregate(
          |  zip_with(xs, sequence(1, size(xs)),
          |    (x, i) -> x / CAST(shiftleft(1L, size(xs) - i) AS DOUBLE)),
          |  0D, (acc, c) -> acc + c)""".stripMargin)
      val den = expr("2.0D - 1.0D / CAST(shiftleft(1L, size(xs) - 1) AS DOUBLE)")
      minute
        .withColumn("xs", collect_list(col("v")).over(w))
        .select(col("bucket"), col("v"), (num / den).as("ewma"))
        .orderBy("bucket")
    },

    // VWAP — the canonical tick aggregation: per-day value weighted by
    // the trade-size field (props.k). Fixed-point integer moments
    // (price in cents, weight in centiunits) keep Σ(p·w) and Σw exact
    // under any partition order; the closing division is one double op.
    // Zero-weight days guard to NULL identically on both engines.
    "tick_vwap_daily" -> QueryDef(
      """WITH m AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    COUNT(*) AS n_trades,
        |    CAST(SUM(CAST(CAST(round("value" * 100.0) AS BIGINT)
        |                  * CAST(round(CAST(json_extract_string(props, 'k') AS DOUBLE) * 100.0) AS BIGINT)
        |             AS DECIMAL(30,0))) AS DOUBLE) AS spw,
        |    CAST(SUM(CAST(round(CAST(json_extract_string(props, 'k') AS DOUBLE) * 100.0) AS BIGINT)) AS DOUBLE) AS sw
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT bucket, n_trades,
        |  CASE WHEN sw = 0 THEN NULL ELSE spw / sw / 100.0 END AS vwap
        |FROM m ORDER BY bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val iv = round(col("value") * 100.0).cast("long")
      val ik = round(get_json_object(col("props"), "$.k").cast("double") * 100.0).cast("long")
      graft.Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .groupBy(date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_trades"),
          sum((iv * ik).cast("decimal(30,0)")).cast("double").as("spw"),
          sum(ik).cast("double").as("sw"))
        .select(col("bucket"), col("n_trades"),
          when(col("sw") === 0, lit(null)).otherwise(col("spw") / col("sw") / lit(100.0))
            .as("vwap"))
        .orderBy("bucket")
    },

    // volume-anomaly detection: per-day event counts z-scored against
    // the series' own mean/stddev. Counts are integers, so the moment
    // sums (Σn, Σn²) are exact BIGINT arithmetic; mean/variance then
    // derive in double via the same formula on both engines — fully
    // deterministic, no fp-order dependence anywhere. Two tiny
    // aggregates (days, then series), broadcast back over the days.
    "tick_zscore_day" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type,
        |    CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
        |    sqrt((CAST(SUM(n * n) AS DOUBLE)
        |          - CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE) / COUNT(*))
        |         / (COUNT(*) - 1)) AS sd
        |  FROM day GROUP BY 1
        |)
        |SELECT day.event_type AS event_type, bucket, n,
        |  (n - mu) / sd AS z,
        |  (abs(n - mu) > 2 * sd) AS is_anomaly
        |FROM day JOIN st ON day.event_type = st.event_type
        |ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val st = day.groupBy(col("event_type").as("s_type"))
        .agg(
          (sum("n").cast("double") / count(lit(1))).as("mu"),
          sqrt((sum(col("n") * col("n")).cast("double")
            - sum("n").cast("double") * sum("n").cast("double") / count(lit(1)))
            / (count(lit(1)) - 1)).as("sd"))
      day.join(broadcast(st), col("event_type") === col("s_type"))
        .select(col("event_type"), col("bucket"), col("n"),
          ((col("n") - col("mu")) / col("sd")).as("z"),
          (abs(col("n") - col("mu")) > lit(2) * col("sd")).as("is_anomaly"))
        .orderBy("event_type", "bucket")
    }
  )
}
