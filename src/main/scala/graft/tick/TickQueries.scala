package graft.tick
import graft.Pinned.PinnedOps

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

    // AVERAGE TRUE RANGE — Wilder's volatility indicator over the
    // daily OHLC frame, completing the indicator family (Bollinger =
    // dispersion bands, RSI = momentum, ATR = range volatility).
    // True range = max(H−L, |H−prevClose|, |L−prevClose|) — the gap
    // between sessions counts, which plain H−L misses; the first day
    // of each series falls back to H−L (Wilder's convention). The
    // 7-day rolling total stays ×7 integer cents (the Bollinger
    // trick: no division, no fp), and the lag + rolling-sum windows
    // share ONE sort per series. Series = event types, days collapse
    // first, so windows run over the (series, day) axis, never ticks.
    "tick_atr" -> QueryDef(
      """WITH o AS (
        |  SELECT event_type AS series, CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(round(MAX("value")*100) AS BIGINT) AS h,
        |    CAST(round(MIN("value")*100) AS BIGINT) AS l,
        |    CAST(round(MAX_BY("value", ts)*100) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT series, d, h, l,
        |    lag(c) OVER (PARTITION BY series ORDER BY d) AS pc
        |  FROM o),
        |tr AS (
        |  SELECT series, d,
        |    CASE WHEN pc IS NULL THEN h - l
        |         ELSE GREATEST(h - l, abs(h - pc), abs(l - pc)) END AS tr_cents
        |  FROM t)
        |SELECT series, d, tr_cents,
        |  CAST(SUM(tr_cents) OVER (PARTITION BY series ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS atr7x_cents
        |FROM tr ORDER BY series, d""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val src = EventsSource(s, d)
      val o = src.frame
        .groupBy(col("event_type").as("series"),
          date_trunc("day", src.ts).cast("date").as("d"))
        .agg(expr("CAST(round(MAX(value)*100) AS BIGINT)").as("h"),
          expr("CAST(round(MIN(value)*100) AS BIGINT)").as("l"),
          expr("CAST(round(MAX_BY(value, ts)*100) AS BIGINT)").as("c"))
      val wo = Window.partitionBy("series").orderBy("d")
      val t = o.select(col("series"), col("d"), col("h"), col("l"),
        lag("c", 1).over(wo).as("pc"))
      val tr = t.select(col("series"), col("d"),
        when(col("pc").isNull, col("h") - col("l"))
          .otherwise(greatest(col("h") - col("l"),
            abs(col("h") - col("pc")), abs(col("l") - col("pc"))))
          .as("tr_cents"))
      val w7 = Window.partitionBy("series").orderBy("d").rowsBetween(-6, 0)
      tr.select(col("series"), col("d"), col("tr_cents"),
          sum("tr_cents").over(w7).cast("long").as("atr7x_cents"))
        .orderBy("series", "d")
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
    },

    // TWAP — time-weighted average over the IRREGULAR series (the
    // TSDB integral: each observation holds until the next one, so
    // sparse quiet hours don't get out-voted by bursts the way a plain
    // AVG is). Per (series, day): Σ vc·gap_µs / Σ gap_µs between the
    // day's first and last observation. Every product fits a BIGINT
    // and the numerator accumulates in DECIMAL(38,0)/HUGEINT — exact
    // under any partition order; one double-division sequence closes
    // it. Ties at the same µs are totally ordered by event_id, so the
    // hold-forward attribution is deterministic on both engines. One
    // window + one aggregate, both keyed on (series, day).
    "tick_twap" -> QueryDef(
      """WITH t AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    epoch_us(ts) AS us, event_id,
        |    CAST(round("value" * 100) AS BIGINT) AS vc
        |  FROM events WHERE event_type IN ('click', 'view')
        |), g AS (
        |  SELECT event_type, day, vc,
        |    LEAD(us) OVER (PARTITION BY event_type, day
        |      ORDER BY us, event_id) - us AS gap
        |  FROM t
        |), a AS (
        |  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(vc * gap) AS DOUBLE) AS num,
        |    CAST(SUM(gap) AS BIGINT) AS den
        |  FROM g GROUP BY 1, 2)
        |SELECT event_type, day, n_obs,
        |  CASE WHEN den = 0 OR den IS NULL THEN NULL
        |       ELSE num / CAST(den AS DOUBLE) / 100.0 END AS twap
        |FROM a ORDER BY event_type, day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
      val t = graft.Tables.events(s, d)
        .where(col("event_type").isin("click", "view"))
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      val g = t.select(col("event_type"), col("day"), col("vc"),
        (lead("us", 1).over(w) - col("us")).as("gap"))
      g.groupBy("event_type", "day")
        .agg(count(lit(1)).as("n_obs"),
          sum((col("vc") * col("gap")).cast("decimal(38,0)")).cast("double").as("num"),
          sum("gap").as("den"))
        .select(col("event_type"), col("day"), col("n_obs"),
          when(col("den") === 0 || col("den").isNull, lit(null))
            .otherwise(col("num") / col("den").cast("double") / lit(100.0)).as("twap"))
        .orderBy("event_type", "day")
    },

    // PromQL increase() with counter-reset handling: per series, the
    // hourly-sampled last value in cents steps forward by v - prev,
    // except a DROP means the counter restarted — the step is v itself
    // (the monotone-counter convention every metrics backend
    // implements). Steps are exact BIGINTs, so daily increase totals
    // and reset counts are hash-exact; the lag window and the daily
    // rollup share the series key.
    "tick_counter_increase" -> QueryDef(
      """WITH h AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY(CAST(round("value" * 100) AS BIGINT), ts) AS vc
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type, bucket, vc,
        |    LAG(vc) OVER (PARTITION BY event_type ORDER BY bucket) AS prev
        |  FROM h)
        |SELECT event_type, CAST(date_trunc('day', bucket) AS TIMESTAMP) AS day,
        |  CAST(SUM(CASE WHEN prev IS NULL THEN NULL
        |                WHEN vc >= prev THEN vc - prev ELSE vc END) AS BIGINT) AS increase,
        |  CAST(COUNT(CASE WHEN vc < prev THEN 1 END) AS BIGINT) AS n_resets
        |FROM st GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
      val h = graft.Tables.events(s, d)
        .where(col("event_type").isin("click", "view"))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(max_by(expr("CAST(round(value * 100) AS BIGINT)"), col("ts_ns")).as("vc"))
      h.withColumn("prev", lag("vc", 1).over(w))
        .groupBy(col("event_type"), date_trunc("day", col("bucket")).as("day"))
        .agg(
          sum(when(col("prev").isNull, lit(null))
            .when(col("vc") >= col("prev"), col("vc") - col("prev"))
            .otherwise(col("vc"))).as("increase"),
          count(when(col("vc") < col("prev"), lit(1))).as("n_resets"))
        .orderBy("event_type", "day")
    },

    // autocorrelation (ACF lags 1-3) of each series' daily-count
    // sequence — the seasonality/momentum diagnostic a forecasting
    // pipeline runs first. Every moment (Σx, Σx², Σx·x_lag, the
    // head/tail-excluded sums) is an exact BIGINT aggregate; the ACF
    // ratio then derives in one fixed double-op sequence identical on
    // both engines — no fp-order dependence. The lag window and the
    // final aggregate share the series key, so the plan is one
    // window shuffle + a tiny per-series reduce.
    // classical seasonal DECOMPOSITION of each series' daily counts
    // (STL-lite): trend = centered 7-day moving average, seasonal =
    // day-of-week mean of the detrended series, residual = the rest —
    // the forecasting/anomaly preprocessing step. Everything is
    // SCALED BY 7 so the moving average stays an exact integer
    // (trend_x7 = the 7-day window SUM): no fp anywhere, hash-exact.
    // Interior days only (full 7-day windows), so the window frame
    // needs no edge semantics. Scale shape: one bucket aggregate,
    // one series-partitioned window, a broadcast-sized day-of-week
    // mean joined back — series decompose independently.
    "tick_seasonal_decompose" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, bucket, n,
        |    CAST(SUM(n) OVER w AS BIGINT) AS trend_x7,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS wn,
        |    dayofweek(bucket) AS dow
        |  FROM day
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT event_type, bucket, dow, n,
        |        trend_x7, 7 * n - trend_x7 AS det_x7
        |      FROM t WHERE wn = 7),
        |seas AS (SELECT event_type, dow,
        |           CAST(SUM(det_x7) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS seas_x7
        |         FROM f GROUP BY 1, 2)
        |SELECT f.event_type, f.bucket, f.n, f.trend_x7, seas.seas_x7,
        |  f.det_x7 - seas.seas_x7 AS resid_x7
        |FROM f JOIN seas ON f.event_type = seas.event_type AND f.dow = seas.dow
        |ORDER BY f.event_type, f.bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-3, 3)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val t = day.select(col("event_type"), col("bucket"), col("n"),
        sum("n").over(w).as("trend_x7"),
        count(lit(1)).over(w).as("wn"),
        dayofweek(col("bucket")).as("dow"))
      val f = t.where(col("wn") === 7)
        .withColumn("det_x7", lit(7) * col("n") - col("trend_x7"))
      // NB: DuckDB's integer `//` TRUNCATES toward zero (verified on
      // negative sums), exactly like Spark's `div` — plain div is the
      // parity-correct choice even though detrended sums go negative
      val seas = f.groupBy("event_type", "dow")
        .agg(expr("sum(det_x7) div count(1)").as("seas_x7"))
      f.join(broadcast(seas), Seq("event_type", "dow"))
        .select(col("event_type"), col("bucket"), col("n"), col("trend_x7"),
          col("seas_x7"), (col("det_x7") - col("seas_x7")).as("resid_x7"))
        .orderBy("event_type", "bucket")
    },

    // MAX DRAWDOWN of each series' cumulative daily value — the
    // risk/regression metric (largest peak-to-trough fall of a
    // cumulative curve). Same two-window trick as CUSUM: running sum,
    // then prefix MAX, share ONE sort per series; drawdown_t =
    // peak_t − cum_t and the answer is a plain MAX — all integer
    // cents, hash-exact. The day the maximum drawdown bottoms out is
    // tie-broken to the earliest via an (dd, -epoch-day) struct MAX,
    // so even the argmax is deterministic.
    "tick_drawdown" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bucket,
        |    CAST(SUM(v) OVER w AS BIGINT) AS cum
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |                        ROWS UNBOUNDED PRECEDING)),
        |p AS (
        |  SELECT event_type, bucket, cum,
        |    CAST(MAX(cum) OVER w AS BIGINT) AS peak
        |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |                      ROWS UNBOUNDED PRECEDING))
        |SELECT event_type,
        |  CAST(MAX(peak - cum) AS BIGINT) AS max_dd,
        |  make_timestamp(-(MAX(struct_pack(dd := peak - cum,
        |    nday := -epoch_us(bucket))).nday)) AS trough_day,
        |  CAST(MAX(cum) AS BIGINT) AS peak_cum
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val wRun = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("v"))
      val p = day
        .withColumn("cum", sum("v").over(wRun))
        .withColumn("peak", max("cum").over(wRun))
      p.groupBy("event_type")
        .agg(max(col("peak") - col("cum")).as("max_dd"),
          timestamp_micros(-max(struct(
            (col("peak") - col("cum")).as("dd"),
            (-unix_micros(col("bucket"))).as("nday"))).getField("nday"))
            .as("trough_day"),
          max("cum").as("peak_cum"))
        .orderBy("event_type")
    },

    // seasonal-residual ANOMALY detection: compose the STL-lite
    // decomposition with a robust threshold — a day is anomalous when
    // its |residual| exceeds 3x the series' MAD of residuals (the
    // seasonality-aware upgrade of tick_zscore_day: a Saturday dip is
    // NOT an anomaly once the weekly profile is removed). The MAD is
    // the LOWER median by rank selection — integers end to end, no
    // interpolation — so the flags are hash-exact. Scale shape: the
    // decomposition's windows + two tiny per-series aggregates; the
    // threshold join broadcasts per-series scalars.
    "tick_anomaly_stl" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, bucket, n,
        |    CAST(SUM(n) OVER w AS BIGINT) AS trend_x7,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS wn,
        |    dayofweek(bucket) AS dow
        |  FROM day
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT event_type, bucket, dow, n,
        |        7 * n - trend_x7 AS det_x7
        |      FROM t WHERE wn = 7),
        |seas AS (SELECT event_type, dow,
        |           CAST(SUM(det_x7) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS seas_x7
        |         FROM f GROUP BY 1, 2),
        |res AS (SELECT f.event_type, f.bucket,
        |          abs(f.det_x7 - seas.seas_x7) AS aresid
        |        FROM f JOIN seas ON f.event_type = seas.event_type
        |                        AND f.dow = seas.dow),
        |rk AS (SELECT event_type, aresid,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY aresid, bucket) AS i,
        |         COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |       FROM res),
        |mad AS (SELECT event_type, aresid AS mad
        |        FROM rk WHERE i = (cnt + 1) // 2)
        |SELECT res.event_type, res.bucket, res.aresid, mad.mad
        |FROM res JOIN mad ON res.event_type = mad.event_type
        |WHERE res.aresid > 3 * mad.mad
        |ORDER BY res.event_type, res.bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-3, 3)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val t = day.select(col("event_type"), col("bucket"), col("n"),
        sum("n").over(w).as("trend_x7"),
        count(lit(1)).over(w).as("wn"),
        dayofweek(col("bucket")).as("dow"))
      val f = t.where(col("wn") === 7)
        .withColumn("det_x7", lit(7) * col("n") - col("trend_x7"))
      val seas = f.groupBy("event_type", "dow")
        .agg(expr("sum(det_x7) div count(1)").as("seas_x7"))
      val res = f.join(broadcast(seas), Seq("event_type", "dow"))
        .select(col("event_type"), col("bucket"),
          abs(col("det_x7") - col("seas_x7")).as("aresid"))
        .pinned // feeds both the rank pass and the flag join
      val rk = res.select(col("event_type"), col("aresid"),
        row_number().over(Window.partitionBy("event_type")
          .orderBy("aresid", "bucket")).as("i"),
        count(lit(1)).over(Window.partitionBy("event_type")).as("cnt"))
      val mad = rk.where(col("i") === expr("(cnt + 1) div 2"))
        .select(col("event_type"), col("aresid").as("mad"))
      res.join(broadcast(mad), "event_type")
        .where(col("aresid") > lit(3) * col("mad"))
        .select(col("event_type"), col("bucket"), col("aresid"), col("mad"))
        .orderBy("event_type", "bucket")
    },

    // rolling 24-hour correlation between paired series (click~view,
    // click~purchase, view~error hourly cent-sums) — the co-movement
    // monitor a market/ops dashboard keeps per instrument pair. Every
    // windowed moment (n, Σa, Σb, Σa², Σb², Σab) is an exact BIGINT
    // over a ROWS frame, so the rolling state is hash-exact and
    // fp-order-free; Pearson r then derives per row in one fixed
    // double-op sequence identical on both engines (like tick_acf).
    // Scale shape: the window partitions by PAIR — each pair's series
    // sorts independently, so adding instruments scales out, and the
    // hourly pre-aggregate means the window sees buckets, not raw
    // events. (At cent sums past ~1e9/hour the BIGINT moments need
    // DECIMAL(38) — same plan, wider lanes.)
    "tick_rolling_corr" -> QueryDef(
      """WITH h AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |p(ta, tb) AS (VALUES ('click','view'), ('click','purchase'), ('view','error')),
        |j AS (
        |  SELECT p.ta || '~' || p.tb AS pair, a.bucket, a.v AS va, b.v AS vb
        |  FROM p JOIN h a ON a.event_type = p.ta
        |         JOIN h b ON b.event_type = p.tb AND b.bucket = a.bucket),
        |m AS (
        |  SELECT pair, bucket,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
        |    CAST(SUM(va) OVER w AS BIGINT) AS sa,
        |    CAST(SUM(vb) OVER w AS BIGINT) AS sb,
        |    CAST(SUM(va * va) OVER w AS BIGINT) AS saa,
        |    CAST(SUM(vb * vb) OVER w AS BIGINT) AS sbb,
        |    CAST(SUM(va * vb) OVER w AS BIGINT) AS sab
        |  FROM j
        |  WINDOW w AS (PARTITION BY pair ORDER BY bucket
        |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT pair, bucket, n,
        |  CASE WHEN n * saa - sa * sa = 0 OR n * sbb - sb * sb = 0 THEN NULL
        |       ELSE CAST(n * sab - sa * sb AS DOUBLE)
        |            / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
        |               * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))) END AS r
        |FROM m WHERE n = 24 ORDER BY pair, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val h = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("v"))
      val pairs = s.range(1).select(explode(array(
          struct(lit("click").as("ta"), lit("view").as("tb")),
          struct(lit("click").as("ta"), lit("purchase").as("tb")),
          struct(lit("view").as("ta"), lit("error").as("tb")))).as("p"))
        .select(col("p.ta").as("ta"), col("p.tb").as("tb"))
      val j = broadcast(pairs)
        .join(h.as("a"), col("a.event_type") === col("ta"))
        .join(h.as("b"),
          col("b.event_type") === col("tb") && col("b.bucket") === col("a.bucket"))
        .select(concat(col("ta"), lit("~"), col("tb")).as("pair"),
          col("a.bucket").as("bucket"), col("a.v").as("va"), col("b.v").as("vb"))
      val w = Window.partitionBy("pair").orderBy("bucket").rowsBetween(-23, 0)
      val m = j.select(col("pair"), col("bucket"),
        count(lit(1)).over(w).as("n"),
        sum("va").over(w).as("sa"), sum("vb").over(w).as("sb"),
        sum(col("va") * col("va")).over(w).as("saa"),
        sum(col("vb") * col("vb")).over(w).as("sbb"),
        sum(col("va") * col("vb")).over(w).as("sab"))
      val covN = col("n") * col("sab") - col("sa") * col("sb")
      val varA = col("n") * col("saa") - col("sa") * col("sa")
      val varB = col("n") * col("sbb") - col("sb") * col("sb")
      m.where(col("n") === 24)
        .select(col("pair"), col("bucket"), col("n"),
          when(varA === 0 || varB === 0, lit(null)).otherwise(
            covN.cast("double")
              / (sqrt(varA.cast("double")) * sqrt(varB.cast("double")))).as("r"))
        .orderBy("pair", "bucket")
    },

    // LJUNG-BOX Q — the portmanteau "is this series white noise?"
    // test over the first 3 autocorrelations, the diagnostic run on
    // model residuals before trusting a forecast. Builds on the
    // tick_acf skeleton (same exact-BIGINT moment collapse, same
    // demeaned-autocovariance closed form); the r_k doubles come from
    // one fixed op sequence and Q = n(n+2)·Σ r_k²/(n−k) closes in one
    // more, micro-scaled — hash-exact like the ACF itself. Windows
    // run over the (series, day) axis, never ticks.
    "tick_ljung_box" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), l AS (
        |  SELECT event_type, n,
        |    lag(n, 1) OVER w AS n1, lag(n, 2) OVER w AS n2, lag(n, 3) OVER w AS n3
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
        |), m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n * n) AS BIGINT) AS q,
        |    CAST(SUM(n * n1) AS BIGINT) AS p1, CAST(SUM(n * n2) AS BIGINT) AS p2,
        |    CAST(SUM(n * n3) AS BIGINT) AS p3,
        |    CAST(SUM(CASE WHEN n1 IS NOT NULL THEN n END) AS BIGINT) AS a1,
        |    CAST(SUM(CASE WHEN n2 IS NOT NULL THEN n END) AS BIGINT) AS a2,
        |    CAST(SUM(CASE WHEN n3 IS NOT NULL THEN n END) AS BIGINT) AS a3,
        |    CAST(SUM(n1) AS BIGINT) AS b1, CAST(SUM(n2) AS BIGINT) AS b2,
        |    CAST(SUM(n3) AS BIGINT) AS b3,
        |    CAST(COUNT(n1) AS BIGINT) AS m1, CAST(COUNT(n2) AS BIGINT) AS m2,
        |    CAST(COUNT(n3) AS BIGINT) AS m3
        |  FROM l GROUP BY 1
        |), f AS (
        |  SELECT *, CAST(s AS DOUBLE) / nd AS mu,
        |    CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nd AS den
        |  FROM m
        |), r AS (
        |  SELECT event_type, nd,
        |    CASE WHEN den = 0 THEN NULL
        |         ELSE (CAST(p1 AS DOUBLE) - mu * a1 - mu * b1 + m1 * mu * mu) / den END AS r1,
        |    CASE WHEN den = 0 THEN NULL
        |         ELSE (CAST(p2 AS DOUBLE) - mu * a2 - mu * b2 + m2 * mu * mu) / den END AS r2,
        |    CASE WHEN den = 0 THEN NULL
        |         ELSE (CAST(p3 AS DOUBLE) - mu * a3 - mu * b3 + m3 * mu * mu) / den END AS r3
        |  FROM f)
        |SELECT event_type, nd,
        |  CASE WHEN nd <= 3 THEN NULL
        |       ELSE CAST(round(1000000 * nd * (nd + 2.0)
        |         * (r1*r1/(nd-1) + r2*r2/(nd-2) + r3*r3/(nd-3))) AS BIGINT)
        |  END AS q_micro
        |FROM r ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val l = day.select(col("event_type"), col("n"),
        lag("n", 1).over(w).as("n1"), lag("n", 2).over(w).as("n2"),
        lag("n", 3).over(w).as("n3"))
      val m = l.groupBy("event_type").agg(
        count(lit(1)).as("nd"), sum("n").as("s"), sum(col("n") * col("n")).as("q"),
        sum(col("n") * col("n1")).as("p1"), sum(col("n") * col("n2")).as("p2"),
        sum(col("n") * col("n3")).as("p3"),
        sum(when(col("n1").isNotNull, col("n"))).as("a1"),
        sum(when(col("n2").isNotNull, col("n"))).as("a2"),
        sum(when(col("n3").isNotNull, col("n"))).as("a3"),
        sum("n1").as("b1"), sum("n2").as("b2"), sum("n3").as("b3"),
        count(col("n1")).as("m1"), count(col("n2")).as("m2"), count(col("n3")).as("m3"))
      val f = m
        .withColumn("mu", col("s").cast("double") / col("nd"))
        .withColumn("den",
          col("q").cast("double") - col("s").cast("double") * col("s").cast("double") / col("nd"))
      def r(k: Int) = when(col("den") === 0, lit(null)).otherwise(
        (col(s"p$k").cast("double") - col("mu") * col(s"a$k") - col("mu") * col(s"b$k")
          + col(s"m$k") * col("mu") * col("mu")) / col("den")).as(s"r$k")
      f.select(col("event_type"), col("nd"), r(1), r(2), r(3))
        .select(col("event_type"), col("nd"),
          when(col("nd") <= 3, lit(null)).otherwise(
            expr("""CAST(round(1000000 * nd * (nd + 2.0)
              * (r1*r1/(nd-1) + r2*r2/(nd-2) + r3*r3/(nd-3))) AS BIGINT)"""))
            .as("q_micro"))
        .orderBy("event_type")
    },

    "tick_acf" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), l AS (
        |  SELECT event_type, n,
        |    lag(n, 1) OVER w AS n1, lag(n, 2) OVER w AS n2, lag(n, 3) OVER w AS n3
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
        |), m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n * n) AS BIGINT) AS q,
        |    CAST(SUM(n * n1) AS BIGINT) AS p1, CAST(SUM(n * n2) AS BIGINT) AS p2,
        |    CAST(SUM(n * n3) AS BIGINT) AS p3,
        |    CAST(SUM(CASE WHEN n1 IS NOT NULL THEN n END) AS BIGINT) AS a1,
        |    CAST(SUM(CASE WHEN n2 IS NOT NULL THEN n END) AS BIGINT) AS a2,
        |    CAST(SUM(CASE WHEN n3 IS NOT NULL THEN n END) AS BIGINT) AS a3,
        |    CAST(SUM(n1) AS BIGINT) AS b1, CAST(SUM(n2) AS BIGINT) AS b2,
        |    CAST(SUM(n3) AS BIGINT) AS b3,
        |    CAST(COUNT(n1) AS BIGINT) AS m1, CAST(COUNT(n2) AS BIGINT) AS m2,
        |    CAST(COUNT(n3) AS BIGINT) AS m3
        |  FROM l GROUP BY 1
        |), f AS (
        |  SELECT *, CAST(s AS DOUBLE) / nd AS mu,
        |    CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nd AS den
        |  FROM m)
        |SELECT event_type, nd,
        |  CASE WHEN den = 0 THEN NULL
        |       ELSE (CAST(p1 AS DOUBLE) - mu * a1 - mu * b1 + m1 * mu * mu) / den END AS r1,
        |  CASE WHEN den = 0 THEN NULL
        |       ELSE (CAST(p2 AS DOUBLE) - mu * a2 - mu * b2 + m2 * mu * mu) / den END AS r2,
        |  CASE WHEN den = 0 THEN NULL
        |       ELSE (CAST(p3 AS DOUBLE) - mu * a3 - mu * b3 + m3 * mu * mu) / den END AS r3
        |FROM f ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val l = day.select(col("event_type"), col("n"),
        lag("n", 1).over(w).as("n1"), lag("n", 2).over(w).as("n2"),
        lag("n", 3).over(w).as("n3"))
      val m = l.groupBy("event_type").agg(
        count(lit(1)).as("nd"), sum("n").as("s"), sum(col("n") * col("n")).as("q"),
        sum(col("n") * col("n1")).as("p1"), sum(col("n") * col("n2")).as("p2"),
        sum(col("n") * col("n3")).as("p3"),
        sum(when(col("n1").isNotNull, col("n"))).as("a1"),
        sum(when(col("n2").isNotNull, col("n"))).as("a2"),
        sum(when(col("n3").isNotNull, col("n"))).as("a3"),
        sum("n1").as("b1"), sum("n2").as("b2"), sum("n3").as("b3"),
        count(col("n1")).as("m1"), count(col("n2")).as("m2"), count(col("n3")).as("m3"))
      val f = m
        .withColumn("mu", col("s").cast("double") / col("nd"))
        .withColumn("den",
          col("q").cast("double") - col("s").cast("double") * col("s").cast("double") / col("nd"))
      def r(k: Int) = when(col("den") === 0, lit(null)).otherwise(
        (col(s"p$k").cast("double") - col("mu") * col(s"a$k") - col("mu") * col(s"b$k")
          + col(s"m$k") * col("mu") * col("mu")) / col("den")).as(s"r$k")
      f.select(col("event_type"), col("nd"), r(1), r(2), r(3)).orderBy("event_type")
    },

    // CUSUM changepoint detection on each series' daily counts: the
    // clamped recurrence s_t = max(0, s_{t-1} + dev_t) is NOT a prefix
    // sum, but it equals SS_t - min(0, min_{i<=t} SS_i) over the
    // UNCLAMPED running sum — so both one-sided CUSUMs become two
    // window passes (running sum, then prefix min/max) that share one
    // sort. Deviations are scaled by the series length (dev = nd*n - s)
    // to stay in exact BIGINT arithmetic — the emitted CUSUMs are
    // hash-exact integers; only the 5σ shift flag touches doubles,
    // via the same fixed op sequence on both engines.
    "tick_cusum" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type AS s_type, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(n) AS BIGINT) AS s,
        |    sqrt((CAST(SUM(n * n) AS DOUBLE)
        |          - CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE) / COUNT(*))
        |         / (COUNT(*) - 1)) AS sd
        |  FROM day GROUP BY 1
        |), dev AS (
        |  SELECT event_type, bucket, n, nd, sd,
        |    CAST(SUM(nd * n - s) OVER (PARTITION BY event_type ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ss
        |  FROM day JOIN st ON day.event_type = st.s_type
        |), c AS (
        |  SELECT event_type, bucket, n, nd, sd, ss,
        |    CAST(ss - LEAST(MIN(ss) OVER w, 0) AS BIGINT) AS cusum_up,
        |    CAST(GREATEST(MAX(ss) OVER w, 0) - ss AS BIGINT) AS cusum_down
        |  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT event_type, bucket, n, cusum_up, cusum_down,
        |  (cusum_up > 5 * nd * sd) OR (cusum_down > 5 * nd * sd) AS is_shift
        |FROM c ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val st = day.groupBy(col("event_type").as("s_type")).agg(
        count(lit(1)).as("nd"), sum("n").as("s"),
        sqrt((sum(col("n") * col("n")).cast("double")
          - sum("n").cast("double") * sum("n").cast("double") / count(lit(1)))
          / (count(lit(1)) - 1)).as("sd"))
      val dev = day.join(broadcast(st), col("event_type") === col("s_type"))
        .withColumn("ss", sum(col("nd") * col("n") - col("s")).over(w))
      dev.select(col("event_type"), col("bucket"), col("n"),
          (col("ss") - least(min("ss").over(w), lit(0L))).as("cusum_up"),
          (greatest(max("ss").over(w), lit(0L)) - col("ss")).as("cusum_down"),
          ((col("ss") - least(min("ss").over(w), lit(0L)) > lit(5) * col("nd") * col("sd"))
            || (greatest(max("ss").over(w), lit(0L)) - col("ss") > lit(5) * col("nd") * col("sd")))
            .as("is_shift"))
        .orderBy("event_type", "bucket")
    },

    // BOLLINGER BANDS over each series' daily total — the
    // volatility-envelope chart primitive (mid = 7-day moving total,
    // band = ±2 moving stddevs). Everything stays in the x7 integer
    // frame: s7 = ROWS-window sum (= 7x the moving mean), q7 = sum of
    // squares, and 7*q7 − s7² = 49x the population variance, all
    // BIGINT; the single sqrt rounds to integer cents (= 7x the
    // stddev) deterministically, so the breach flags are hash-exact.
    // One window sort per series carries all three running sums —
    // same shared-sort shape as CUSUM/drawdown; trivially scale-safe.
    "tick_bollinger" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |w7 AS (
        |  SELECT event_type, bucket, v,
        |    CAST(SUM(v) OVER w AS BIGINT) AS s7,
        |    CAST(SUM(v * v) OVER w AS BIGINT) AS q7,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS wn
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT event_type, bucket, v, s7,
        |    CAST(round(sqrt(CAST(7 * q7 - s7 * s7 AS DOUBLE))) AS BIGINT) AS sd_x7
        |  FROM w7 WHERE wn = 7)
        |SELECT event_type, bucket, v, s7, sd_x7,
        |  s7 + 2 * sd_x7 AS upper_x7, s7 - 2 * sd_x7 AS lower_x7,
        |  7 * v > s7 + 2 * sd_x7 AS breach_up,
        |  7 * v < s7 - 2 * sd_x7 AS breach_down
        |FROM b ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-6, 0)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("v"))
      val b = day
        .withColumn("s7", sum("v").over(w))
        .withColumn("q7", sum(col("v") * col("v")).over(w))
        .withColumn("wn", count(lit(1)).over(w))
        .where(col("wn") === 7)
        .withColumn("sd_x7",
          expr("CAST(round(sqrt(CAST(7 * q7 - s7 * s7 AS DOUBLE))) AS BIGINT)"))
      b.select(col("event_type"), col("bucket"), col("v"), col("s7"), col("sd_x7"),
          (col("s7") + lit(2) * col("sd_x7")).as("upper_x7"),
          (col("s7") - lit(2) * col("sd_x7")).as("lower_x7"),
          (lit(7) * col("v") > col("s7") + lit(2) * col("sd_x7")).as("breach_up"),
          (lit(7) * col("v") < col("s7") - lit(2) * col("sd_x7")).as("breach_down"))
        .orderBy("event_type", "bucket")
    },

    // RSI (relative strength index), 7-day cutover — the bounded
    // momentum oscillator. Day-over-day deltas of the daily total
    // split into gain/loss cents (integers); the windowed gain/loss
    // SUMS feed RSI directly (sums, not averages — the /7 cancels),
    // so rsi_ppm = 1e6*sumGain // (sumGain+sumLoss) is pure integer
    // division, hash-exact, with the flat-window zero case surfaced
    // as NULL rather than a fake 50. Uses Cutler's simple-moving
    // form rather than Wilder's recursive smoothing — deliberately:
    // the windowed form needs one sort per series, while Wilder's
    // EWMA-with-memory would serialize the whole series (tick_ewma
    // already demonstrates that shape where it's warranted).
    "tick_rsi" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |diff AS (
        |  SELECT event_type, bucket,
        |    v - lag(v) OVER (PARTITION BY event_type ORDER BY bucket) AS dv
        |  FROM day),
        |gl AS (
        |  SELECT event_type, bucket,
        |    CAST(GREATEST(dv, 0) AS BIGINT) AS gain,
        |    CAST(GREATEST(-dv, 0) AS BIGINT) AS loss
        |  FROM diff WHERE dv IS NOT NULL),
        |w7 AS (
        |  SELECT event_type, bucket,
        |    CAST(SUM(gain) OVER w AS BIGINT) AS sg,
        |    CAST(SUM(loss) OVER w AS BIGINT) AS sl,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS wn
        |  FROM gl WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket, sg, sl,
        |  CASE WHEN sg + sl = 0 THEN NULL
        |       ELSE sg * 1000000 // (sg + sl) END AS rsi_ppm
        |FROM w7 WHERE wn = 7 ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy("event_type").orderBy("bucket")
      val w7 = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-6, 0)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("v"))
      val gl = day
        .withColumn("dv", col("v") - lag("v", 1).over(wLag))
        .where(col("dv").isNotNull)
        .select(col("event_type"), col("bucket"),
          greatest(col("dv"), lit(0L)).as("gain"),
          greatest(-col("dv"), lit(0L)).as("loss"))
      gl.withColumn("sg", sum("gain").over(w7))
        .withColumn("sl", sum("loss").over(w7))
        .withColumn("wn", count(lit(1)).over(w7))
        .where(col("wn") === 7)
        .select(col("event_type"), col("bucket"), col("sg"), col("sl"),
          when(col("sg") + col("sl") === 0, lit(null).cast("long"))
            .otherwise(expr("sg * 1000000 div (sg + sl)")).as("rsi_ppm"))
        .orderBy("event_type", "bucket")
    },

    // MACD — the fast-minus-slow EWMA momentum signal (classic quant
    // crossover indicator), composed from tick_ewma's finite-window
    // halving-weight machinery at two horizons (8 and 20 minute
    // buckets). Both EWMAs read ONE ordered window pass over the
    // minute series (two collect_list frames, same sort); weights are
    // powers of two, so every per-row fold is the identical IEEE
    // sequence on both engines — macd needs only a 9 dp round, no
    // decimal scaffolding. Single filtered series -> one ordered
    // partition; a multi-symbol caller partitions by the series key.
    "tick_macd" -> QueryDef(
      """WITH m AS (
        |  SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS bucket,
        |    CAST(SUM(CAST("value" AS DECIMAL(20,4))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |), l AS (
        |  SELECT bucket, v,
        |    list(v) OVER (ORDER BY bucket
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS xf,
        |    list(v) OVER (ORDER BY bucket
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
        |  FROM m
        |), e AS (
        |  SELECT bucket, v,
        |    list_reduce(list_transform(xf,
        |        (x, i) -> x / CAST(1 << (len(xf) - i) AS DOUBLE)), (a, c) -> a + c)
        |      / (2.0 - 1.0 / CAST(1 << (len(xf) - 1) AS DOUBLE)) AS fast,
        |    list_reduce(list_transform(xs,
        |        (x, i) -> x / CAST(1 << (len(xs) - i) AS DOUBLE)), (a, c) -> a + c)
        |      / (2.0 - 1.0 / CAST(1 << (len(xs) - 1) AS DOUBLE)) AS slow
        |  FROM l
        |)
        |SELECT bucket, round(fast, 9) AS fast, round(slow, 9) AS slow,
        |  round(fast - slow, 9) AS macd
        |FROM e ORDER BY bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val minute = graft.Tables.events(s, d)
        .where(col("event_type") === "click")
        .groupBy(date_trunc("minute", col("ts")).as("bucket"))
        .agg((sum(col("value").cast("decimal(20,4)")).cast("double")
          / count(lit(1)).cast("double")).as("v"))
      val wf = Window.orderBy("bucket").rowsBetween(-7, 0)
      val ws = Window.orderBy("bucket").rowsBetween(-19, 0)
      def ewma(xs: String) = expr(
        s"""aggregate(
           |  zip_with($xs, sequence(1, size($xs)),
           |    (x, i) -> x / CAST(shiftleft(1L, size($xs) - i) AS DOUBLE)),
           |  0D, (acc, c) -> acc + c)
           | / (2.0D - 1.0D / CAST(shiftleft(1L, size($xs) - 1) AS DOUBLE))""".stripMargin)
      minute
        .withColumn("xf", collect_list(col("v")).over(wf))
        .withColumn("xs", collect_list(col("v")).over(ws))
        .select(col("bucket"), col("v"),
          ewma("xf").as("fast_raw"), ewma("xs").as("slow_raw"))
        .select(col("bucket"),
          round(col("fast_raw"), 9).as("fast"),
          round(col("slow_raw"), 9).as("slow"),
          round(col("fast_raw") - col("slow_raw"), 9).as("macd"))
        .orderBy("bucket")
    },

    // STOCHASTIC OSCILLATOR %K — where today's close sits inside the
    // 14-day high/low channel, the range-position momentum indicator
    // (Bollinger = dispersion, RSI = gain share, ATR = range size;
    // %K completes the set with POSITION in range). Daily closes are
    // last-by-timestamp (the established OHLC semantics), channel
    // extremes are rolling MAX/MIN windows over the per-day frame —
    // all integer cents, %K in truncating ppm, degenerate flat
    // channels yield NULL. Window runs on the tiny daily frame, never
    // raw events.
    "tick_stochastic" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY(CAST(round(value*100) AS BIGINT), ts) AS close
        |  FROM events GROUP BY 1, 2),
        |ch AS (
        |  SELECT event_type, bucket, close,
        |    MAX(close) OVER w AS hi, MIN(close) OVER w AS lo,
        |    COUNT(*) OVER w AS wn
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket, close, hi, lo,
        |  CASE WHEN hi = lo THEN NULL
        |       ELSE (close - lo) * 1000000 // (hi - lo) END AS k_ppm
        |FROM ch WHERE wn = 14 ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-13, 0)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(max_by(expr("CAST(round(value*100) AS BIGINT)"), col("ts")).as("close"))
      day
        .withColumn("hi", max("close").over(w))
        .withColumn("lo", min("close").over(w))
        .withColumn("wn", count(lit(1)).over(w))
        .where(col("wn") === 14)
        .select(col("event_type"), col("bucket"), col("close"), col("hi"), col("lo"),
          when(col("hi") === col("lo"), lit(null).cast("long"))
            .otherwise(expr("(close - lo) * 1000000 div (hi - lo)")).as("k_ppm"))
        .orderBy("event_type", "bucket")
    },

    // ON-BALANCE VOLUME — cumulative volume signed by the close-to-
    // close direction: volume flows "in" on up days, "out" on down
    // days, the classic accumulation/distribution divergence signal.
    // Close = last-by-timestamp cents, volume = daily event count;
    // sign and running sum are exact integers, so the whole series is
    // hash-gated. Two ordered windows over the daily frame (lag +
    // running sum), partitioned per series — the raw events collapse
    // to days in the one grouped pass before any window runs.
    "tick_obv" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY(CAST(round(value*100) AS BIGINT), ts) AS close,
        |    CAST(COUNT(*) AS BIGINT) AS vol
        |  FROM events GROUP BY 1, 2),
        |sg AS (
        |  SELECT event_type, bucket, vol,
        |    CASE WHEN close > lag(close) OVER w THEN vol
        |         WHEN close < lag(close) OVER w THEN -vol
        |         ELSE 0 END AS flow
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
        |SELECT event_type, bucket,
        |  CAST(SUM(flow) OVER (PARTITION BY event_type ORDER BY bucket
        |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
        |FROM sg ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy("event_type").orderBy("bucket")
      val wRun = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(max_by(expr("CAST(round(value*100) AS BIGINT)"), col("ts")).as("close"),
          count(lit(1)).as("vol"))
      day
        .withColumn("flow",
          when(col("close") > lag("close", 1).over(wLag), col("vol"))
            .when(col("close") < lag("close", 1).over(wLag), -col("vol"))
            .otherwise(lit(0L)))
        .select(col("event_type"), col("bucket"),
          sum("flow").over(wRun).cast("long").as("obv"))
        .orderBy("event_type", "bucket")
    },

    // ULCER INDEX — RMS of the percentage drawdown from the rolling
    // 14-day high: where tick_drawdown reports the single WORST dip,
    // the ulcer index integrates how deep and how long the series sat
    // below its peak (the denominator of the Martin ratio). Drawdown
    // ppm is exact integer against the window max; the RMS closes
    // with one sqrt of an integer mean (truncating // 14), rounded
    // once — hash-gated. Two window passes over the tiny daily frame.
    "tick_ulcer_index" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY(CAST(round(value*100) AS BIGINT), ts) AS close
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type, bucket,
        |    CAST((MAX(close) OVER w - close) * 1000000
        |         // MAX(close) OVER w AS BIGINT) AS dd_ppm,
        |    COUNT(*) OVER w AS wn
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |sq AS (
        |  SELECT event_type, bucket, dd_ppm,
        |    CAST(SUM(dd_ppm * dd_ppm) OVER w // 14 AS BIGINT) AS msq
        |  FROM dd WHERE wn = 14
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket, dd_ppm,
        |  CAST(round(sqrt(CAST(msq AS DOUBLE))) AS BIGINT) AS ulcer_ppm
        |FROM sq ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-13, 0)
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(max_by(expr("CAST(round(value*100) AS BIGINT)"), col("ts")).as("close"))
      val dd = day
        .withColumn("mx", max("close").over(w))
        .withColumn("wn", count(lit(1)).over(w))
        .select(col("event_type"), col("bucket"),
          expr("CAST((mx - close) * 1000000 div mx AS BIGINT)").as("dd_ppm"),
          col("wn"))
        .where(col("wn") === 14)
      dd.withColumn("msq", sum(expr("dd_ppm * dd_ppm")).over(w).cast("long"))
        .select(col("event_type"), col("bucket"), col("dd_ppm"),
          expr("CAST(round(sqrt(CAST(msq div 14 AS DOUBLE))) AS BIGINT)")
            .as("ulcer_ppm"))
        .orderBy("event_type", "bucket")
    },

    // ANNUALIZED SHARPE RATIO — mean over volatility of daily ppm
    // returns, scaled by sqrt(252): the risk-adjusted-return summary
    // the drawdown/ulcer metrics complement. Returns are exact
    // integer ppm against the prior close; mean/variance come from
    // the exact (n, sum, sum-sq) identity, and ONE shared double-op
    // sequence (sqrt only — IEEE-exact) closes the ratio. Per-series
    // lag window over the daily frame + one aggregate; hash-gated.
    "tick_sharpe" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY(CAST(round(value*100) AS BIGINT), ts) AS close
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type,
        |    CAST((close - lag(close) OVER w) * 1000000
        |         // lag(close) OVER w AS BIGINT) AS r
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
        |g AS (SELECT event_type, CAST(COUNT(r) AS BIGINT) AS n,
        |        CAST(SUM(r) AS BIGINT) AS s, CAST(SUM(r*r) AS BIGINT) AS q
        |      FROM r WHERE r IS NOT NULL GROUP BY 1)
        |SELECT event_type, n,
        |  CAST(s // n AS BIGINT) AS mean_ppm,
        |  CAST(round(
        |    (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
        |    * sqrt(252.0) * 1000) AS BIGINT) AS sharpe_milli
        |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy("event_type").orderBy("bucket")
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(max_by(expr("CAST(round(value*100) AS BIGINT)"), col("ts")).as("close"))
      val r = day
        .withColumn("prev", lag("close", 1).over(wLag))
        .where(col("prev").isNotNull)
        .select(col("event_type"),
          expr("CAST((close - prev) * 1000000 div prev AS BIGINT)").as("r"))
      r.groupBy("event_type")
        .agg(count("r").as("n"), sum("r").as("s"), sum(expr("r*r")).as("q"))
        .selectExpr("event_type", "n",
          "CAST(s div n AS BIGINT) AS mean_ppm",
          """CAST(round(
             (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
             * sqrt(252.0) * 1000) AS BIGINT) AS sharpe_milli""")
        .orderBy("event_type")
    },

    // VALUE-AT-RISK + EXPECTED SHORTFALL — the tail-risk pair: VaR95
    // is the 5th percentile of daily ppm returns (how bad a 1-in-20
    // day gets), ES the mean of the days at or below it (how bad the
    // bad days are — the coherent measure Basel moved to). Percentile
    // via the shared histogram-refinement RankStats (no per-group
    // value maps, no full shuffle); the tail mean is exact integer
    // over the <= VaR cut — the interpolated threshold is a
    // half-integer-safe double on both engines. Completes the risk
    // family: sharpe (reward/vol), ulcer (drawdown RMS), VaR/ES (tail).
    "tick_var_es" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY(CAST(round(value*100) AS BIGINT), ts) AS close
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type,
        |    CAST((close - lag(close) OVER w) * 1000000
        |         // lag(close) OVER w AS BIGINT) AS r
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
        |rr AS (SELECT event_type, r FROM r WHERE r IS NOT NULL),
        |v AS (SELECT event_type, quantile_cont(r, 0.05) AS var95 FROM rr
        |      GROUP BY 1)
        |SELECT rr.event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(round(v.var95) AS BIGINT) AS var95_ppm,
        |  CAST(SUM(CASE WHEN rr.r <= v.var95 THEN rr.r END)
        |       // COUNT(CASE WHEN rr.r <= v.var95 THEN 1 END) AS BIGINT)
        |    AS es_ppm
        |FROM rr JOIN v ON rr.event_type = v.event_type
        |GROUP BY rr.event_type, v.var95 ORDER BY rr.event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy("event_type").orderBy("bucket")
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(max_by(expr("CAST(round(value*100) AS BIGINT)"), col("ts")).as("close"))
      val rr = day
        .withColumn("prev", lag("close", 1).over(wLag))
        .where(col("prev").isNotNull)
        .select(col("event_type"),
          expr("CAST((close - prev) * 1000000 div prev AS BIGINT)").as("r"))
        .pinned // percentile pass + tail aggregate
      val v = graft.rel.RankStats.percentiles(rr, "event_type", "r",
          Seq(0.05 -> "var95"))
        .select(col("event_type").as("vet"), col("var95"))
      rr.join(broadcast(v), col("event_type") === col("vet"))
        .groupBy("event_type", "var95")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("r") <= col("var95"), col("r"))).as("tail_sum"),
          count(when(col("r") <= col("var95"), 1)).as("tail_n"))
        .select(col("event_type"), col("n_days"),
          expr("CAST(round(var95) AS BIGINT)").as("var95_ppm"),
          expr("CAST(tail_sum div tail_n AS BIGINT)").as("es_ppm"))
        .orderBy("event_type")
    },

    // DFT POWER SPECTRUM — an 8-bin discrete Fourier transform of
    // each series' daily closes: the frequency-domain seasonality
    // detector (a weekly cycle concentrates power at k = n/7). The
    // twiddle factors pre-round to the 1e-6 grid (the ulp-safe ln()
    // idiom applied to cos/sin), so the correlation sums are exact
    // BIGINT — scaled back by 1e6 before squaring to keep power in
    // range — and the whole spectrum is hash-gated. One tiny
    // day-frame cross join with the 8-row frequency axis, partial-
    // aggregated per (series, k); no FFT recursion needed at this
    // bin count, and the shape stays one aggregate at any series
    // length.
    "tick_dft_power" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY(CAST(round(value*100) AS BIGINT), ts) AS close
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT event_type, close,
        |          CAST(row_number() OVER (PARTITION BY event_type
        |            ORDER BY bucket) - 1 AS BIGINT) AS t,
        |          CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |        FROM day),
        |k AS (SELECT UNNEST(range(1, 9)) AS k),
        |corr AS (
        |  SELECT event_type, k, n,
        |    CAST(SUM(close * CAST(round(cos(2 * pi() * k * t
        |      / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)) // 1000000 AS BIGINT)
        |      AS a,
        |    CAST(SUM(close * CAST(round(sin(2 * pi() * k * t
        |      / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)) // 1000000 AS BIGINT)
        |      AS b
        |  FROM idx CROSS JOIN k GROUP BY 1, 2, 3)
        |SELECT event_type, k, a, b, CAST(a * a + b * b AS BIGINT) AS power
        |FROM corr ORDER BY event_type, k""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val wIdx = Window.partitionBy("event_type").orderBy("bucket")
      val wN = Window.partitionBy("event_type")
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(max_by(expr("CAST(round(value*100) AS BIGINT)"), col("ts")).as("close"))
      val idx = day
        .withColumn("t", (row_number().over(wIdx) - 1).cast("long"))
        .withColumn("n", count(lit(1)).over(wN).cast("long"))
        .select("event_type", "close", "t", "n")
      val ks = idx.sparkSession.range(1, 9).toDF("k")
      idx.crossJoin(broadcast(ks))
        .groupBy("event_type", "k", "n")
        .agg(
          expr("""CAST(SUM(close * CAST(round(cos(2 * pi() * k * t
                  / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)) div 1000000
                  AS BIGINT)""").as("a"),
          expr("""CAST(SUM(close * CAST(round(sin(2 * pi() * k * t
                  / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)) div 1000000
                  AS BIGINT)""").as("b"))
        .select(col("event_type"), col("k"), col("a"), col("b"),
          expr("CAST(a * a + b * b AS BIGINT)").as("power"))
        .orderBy("event_type", "k")
    }
  )
}
