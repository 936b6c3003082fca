package graft.rel
import graft.Pinned.PinnedOps

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Event-analytics operators over the events table: ordered funnels,
  * cohort retention, Markov transition matrices, last-touch
  * attribution, and DAU/MAU engagement — the product-analytics surface
  * an analytics engine is expected to ship alongside the relational
  * core.
  *
  * Scale shape: every stage/cohort pass filters to ONE event type
  * before aggregating (predicate reaches the parquet scan), and all
  * joins/aggregations key on `user_id` — co-partitioned shuffles, no
  * pair space, no driver-side iteration.
  *
  * Timestamp parity note: `events.ts` is TIMESTAMP(NANOS); both sides
  * compare at µs precision (Spark's `ts` column is µs-truncated, the
  * oracle CASTs to TIMESTAMP) so ordering ties resolve identically.
  */
object EventQueries {

  /** Generic ordered funnel over (user_id, event_type, t) rows: a user
    * reaches stage k when a `stages(k-1)` event exists STRICTLY after
    * the time they reached stage k-1 (stage 1 = their first
    * `stages(0)` event). Returns (user_id, stage) with the deepest
    * stage reached; users who never hit stage 1 are absent.
    *
    * Each stage is one type-pruned pass over the events joined to the
    * (shrinking) survivor set of the previous stage — user_id-keyed
    * equi-joins with a time residual, no windows over raw events.
    */
  def funnelStages(events: org.apache.spark.sql.DataFrame, stages: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var prev = events.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("t")).as("rt"))
    val reached = scala.collection.mutable.ArrayBuffer(
      prev.select(col("user_id"), lit(1L).as("stage")))
    stages.tail.zipWithIndex.foreach { case (st, i) =>
      prev = events.where(col("event_type") === st).as("e")
        .join(prev.as("p"),
          col("e.user_id") === col("p.user_id") && col("e.t") > col("p.rt"))
        .groupBy(col("e.user_id").as("user_id")).agg(min(col("e.t")).as("rt"))
      reached += prev.select(col("user_id"), lit(i + 2L).as("stage"))
    }
    reached.reduce(_ unionByName _)
      .groupBy("user_id").agg(max(col("stage")).as("stage"))
  }

  val defs: Map[String, QueryDef] = Map(

    // two-proportion z-test of purchase conversion between the
    // even/odd user cohorts — the experiment readout every A/B
    // platform ships. Cohort sizes and converter counts are exact
    // distinct-user integers (one grouped pass over events); the
    // pooled z-statistic then derives in ONE fixed double-op sequence
    // shared with the oracle and lands as micro-units, so the output
    // is hash-exact. Scale shape: per-user collapse is a partial
    // aggregate on user_id; the test itself runs on a 2-row relation.
    "events_ab_test" -> QueryDef(
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS cohort,
        |    MAX(CASE WHEN event_type = 'purchase'
        |             AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00'
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(conv) AS BIGINT) AS conv
        |      FROM u GROUP BY 1),
        |w AS (SELECT
        |  MAX(CASE WHEN cohort = 0 THEN n END) AS na,
        |  MAX(CASE WHEN cohort = 0 THEN conv END) AS ca,
        |  MAX(CASE WHEN cohort = 1 THEN n END) AS nb,
        |  MAX(CASE WHEN cohort = 1 THEN conv END) AS cb
        |  FROM c)
        |SELECT na, ca, nb, cb,
        |  CAST(round(1000000 * (
        |    (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
        |    / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
        |           * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
        |           * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))
        |  )) AS BIGINT) AS z_micro
        |FROM w""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).as("cohort"))
        .agg(max(when(col("event_type") === "purchase" &&
            col("ts") < to_timestamp(lit("2024-01-03 00:00:00")), 1)
          .otherwise(0)).as("conv"))
      val c = u.groupBy("cohort")
        .agg(count(lit(1)).as("n"), sum("conv").as("conv"))
      val w = c.agg(
        max(when(col("cohort") === 0, col("n"))).as("na"),
        max(when(col("cohort") === 0, col("conv"))).as("ca"),
        max(when(col("cohort") === 1, col("n"))).as("nb"),
        max(when(col("cohort") === 1, col("conv"))).as("cb"))
      w.select(col("na"), col("ca"), col("nb"), col("cb"),
        expr("""CAST(round(1000000 * (
          (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
          / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                 * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                 * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))
        )) AS BIGINT)""").as("z_micro"))
    },

    // MATCH_RECOGNIZE-lite sequential pattern detection: for every
    // VIEW, the FIRST click strictly after it within 12h, then the
    // FIRST purchase strictly after that click within 12h — per-user
    // counts of completed view->click->purchase chains. First-match
    // semantics (min over the time-bounded successor set) keep the
    // result deterministic; unlike events_funnel this matches at EVENT
    // granularity, so one user can complete many instances. Scale
    // shape: every stage is a user_id-keyed equi-join with a bounded
    // time residual + a partial-agg MIN — co-partitioned shuffles, the
    // per-user time windows bound the residual pair space, no windows
    // over raw events, no driver state.
    "events_pattern_match" -> QueryDef(
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t
        |           FROM events),
        |v AS (SELECT user_id, t AS tv FROM e WHERE event_type = 'view'),
        |vc AS (SELECT v.user_id, v.tv, MIN(c.t) AS tc
        |       FROM v JOIN e c ON c.user_id = v.user_id
        |         AND c.event_type = 'click'
        |         AND c.t > v.tv AND c.t <= v.tv + INTERVAL 12 HOUR
        |       GROUP BY 1, 2),
        |vcp AS (SELECT vc.user_id, vc.tv, vc.tc, MIN(p.t) AS tp
        |        FROM vc JOIN e p ON p.user_id = vc.user_id
        |          AND p.event_type = 'purchase'
        |          AND p.t > vc.tc AND p.t <= vc.tc + INTERVAL 12 HOUR
        |        GROUP BY 1, 2, 3)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |       MIN(tv) AS first_start, MAX(tp) AS last_end
        |FROM vcp GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts").as("t"))
      val v = e.where(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("t").as("tv"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("t").as("ct"))
      val vc = v.join(c,
          col("cu") === col("vu") && col("ct") > col("tv") &&
            col("ct") <= col("tv") + expr("INTERVAL 12 HOUR"))
        .groupBy(col("vu").as("user_id"), col("tv"))
        .agg(min(col("ct")).as("tc"))
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("t").as("pt"))
      val vcp = vc.join(p,
          col("pu") === col("user_id") && col("pt") > col("tc") &&
            col("pt") <= col("tc") + expr("INTERVAL 12 HOUR"))
        .groupBy(col("user_id"), col("tv"), col("tc"))
        .agg(min(col("pt")).as("tp"))
      vcp.groupBy("user_id")
        .agg(count(lit(1)).as("n_matches"),
          min("tv").as("first_start"), max("tp").as("last_end"))
        .orderBy("user_id")
    },

    // ordered 3-stage funnel (signup -> first view after it -> first
    // purchase after that) within day 1 — "after" is strict, so each
    // stage's min-time feeds the next stage's lower bound. Three
    // type-pruned scans; each stage shrinks the key set it joins on.
    "events_funnel" -> QueryDef(
      """WITH w AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events
        |  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-02 00:00:00'),
        |s AS (SELECT user_id, min(t) AS t1 FROM w WHERE event_type = 'signup' GROUP BY 1),
        |v AS (SELECT w.user_id, min(w.t) AS t2 FROM w JOIN s ON w.user_id = s.user_id AND w.t > s.t1
        |      WHERE w.event_type = 'view' GROUP BY 1),
        |p AS (SELECT w.user_id, min(w.t) AS t3 FROM w JOIN v ON w.user_id = v.user_id AND w.t > v.t2
        |      WHERE w.event_type = 'purchase' GROUP BY 1)
        |SELECT s.user_id AS user_id,
        |  CAST(1 + CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
        |FROM s LEFT JOIN v ON s.user_id = v.user_id
        |       LEFT JOIN p ON s.user_id = p.user_id
        |ORDER BY user_id""".stripMargin) { (sp, d) =>
      val w = graft.Tables.events(sp, d)
        .where(col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
        .select(col("user_id"), col("event_type"), col("ts").as("t"))
      funnelStages(w, Seq("signup", "view", "purchase")).orderBy("user_id")
    },

    // Z-order layout key: bit-interleave (user_id, event-hour) into a
    // single locality-preserving sort key — the lakehouse clustering
    // step (Delta/Iceberg Z-ORDER) that bounds min/max spans on BOTH
    // dimensions at once when the table is written sorted by z, so
    // row-group pruning works for predicates on either one (ScaleSpec
    // pins the span property against single-dimension sorts). Pure
    // per-row integer math (deterministic, oracle-exact); at 100 TB
    // this keys a repartitionByRange + sortWithinPartitions rewrite.
    "layout_zorder" -> QueryDef(
      """WITH src AS (
        |  SELECT event_id, user_id & 1023 AS a,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) & 1023 AS b
        |  FROM events)
        |SELECT event_id,
        |  -- list_sum returns DOUBLE/HUGEINT in DuckDB; cast back so the
        |  -- driver's typed value hash agrees with Spark's BIGINT z
        |  CAST(list_sum(list_transform(range(10),
        |    i -> ((a >> i) & 1) * (1::BIGINT << (2*i)) + ((b >> i) & 1) * (1::BIGINT << (2*i+1)))) AS BIGINT) AS z
        |FROM src ORDER BY z, event_id""".stripMargin) { (sp, d) =>
      graft.Tables.events(sp, d)
        .select(col("event_id"),
          col("user_id").bitwiseAND(1023).as("a"),
          expr("(unix_micros(ts) div 3600000000) & 1023").as("b"))
        .withColumn("z", expr(
          """aggregate(sequence(0, 9), 0L, (acc, i) ->
            |  acc + ((a >> i) & 1) * shiftleft(1L, 2*i)
            |      + ((b >> i) & 1) * shiftleft(1L, 2*i+1))""".stripMargin))
        .select("event_id", "z")
        .orderBy("z", "event_id")
    },

    // DAU / trailing-28d MAU / stickiness: the engagement dashboard
    // triple. The corpus collapses to the distinct (day, user) table
    // FIRST — the standard 100 TB pre-aggregation — and the trailing
    // window is a day-axis join against that small table (28x |du|
    // worst case, never 28x the raw events). Exact integer distincts;
    // stickiness is one double division.
    "events_dau_mau" -> QueryDef(
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1),
        |mau AS (
        |  SELECT d.day, COUNT(DISTINCT u.user_id) AS mau28
        |  FROM days d JOIN du u ON u.day BETWEEN d.day - 27 AND d.day
        |  GROUP BY 1)
        |SELECT dau.day AS day, dau, mau28,
        |  CAST(dau AS DOUBLE) / mau28 AS stickiness
        |FROM dau JOIN mau ON dau.day = mau.day
        |ORDER BY day""".stripMargin) { (sp, d) =>
      val du = graft.Tables.events(sp, d)
        .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
      val days = du.select("day").distinct()
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = days.as("d")
        .join(du.as("u"),
          col("u.day").between(date_sub(col("d.day"), 27), col("d.day")))
        .groupBy(col("d.day").as("mday"))
        .agg(countDistinct(col("u.user_id")).as("mau28"))
      dau.join(mau, col("day") === col("mday"))
        .select(col("day"), col("dau"), col("mau28"),
          (col("dau").cast("double") / col("mau28")).as("stickiness"))
        .orderBy("day")
    },

    // last-touch attribution: each purchase is credited to the user's
    // most recent click strictly earlier in their (ts, event_id) order,
    // flagged attributed iff within 24h. One window pass over the two
    // relevant event types only (type predicate reaches the scan); the
    // running max(click ts) needs no self-join or per-purchase probe.
    // Timestamps compare as exact epoch-µs integers on both engines.
    "events_attribution" -> QueryDef(
      """WITH s AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t,
        |    max(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_t
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |SELECT event_id AS purchase_id, user_id, t, last_click_t,
        |  (last_click_t IS NOT NULL AND
        |   epoch_us(t) - epoch_us(last_click_t) <= 86400000000) AS attributed
        |FROM s WHERE event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin) { (sp, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      graft.Tables.events(sp, d)
        .where(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("t"),
          max(when(col("event_type") === "click", col("ts"))).over(w)
            .as("last_click_t"))
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("t"),
          col("last_click_t"),
          (col("last_click_t").isNotNull &&
            unix_micros(col("t")) - unix_micros(col("last_click_t")) <= 86400000000L)
            .as("attributed"))
        .orderBy("purchase_id")
    },

    // event-path transition matrix: per-user time-ordered event pairs
    // aggregated into (from, to) counts + row-normalized probabilities
    // (the Markov view of user journeys). One window pass partitioned
    // by user (per-user sequences are short and hash-spread — no skew),
    // one tiny (5x5-key) aggregate; ties in ts break on event_id so
    // both engines order identically. Probability = one double division
    // of exact integer sums — deterministic.
    "events_transitions" -> QueryDef(
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, COUNT(*) AS n FROM seq
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin) { (sp, d) =>
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val counts = graft.Tables.events(sp, d)
        .select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(wSeq).as("to_type"))
        .where(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      counts
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") /
            sum("n").over(Window.partitionBy("from_type"))).as("p"))
        .orderBy("from_type", "to_type")
    },

    // STATIONARY DISTRIBUTION of the event-type Markov chain — "where
    // does a user's session settle?" — by 8 power-iteration rounds
    // over the transition counts in integer 1e-12 probability mass
    // (the PageRank idiom: per-edge floor division makes every round
    // order-independent and hash-exact, so even an iterative fixpoint
    // is oracle-checkable). The chain here has |types| = 5 states, but
    // the plan is the generic one: per-round = one state-keyed
    // broadcast join + partial-agg SUM over the edge relation, the
    // same shape that scales to million-state chains (page/product
    // graphs) where the edge relation is the big side.
    "events_markov_stationary" -> QueryDef(
      """WITH RECURSIVE seq AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
        |pi(it, st, p) AS (
        |  SELECT 0, from_type, 1000000000000::BIGINT FROM rt
        |  UNION ALL
        |  SELECT it + 1, c.to_type, CAST(SUM(pi.p * c.n // rt.tot) AS BIGINT)
        |  FROM pi JOIN c ON c.from_type = pi.st JOIN rt ON rt.from_type = pi.st
        |  WHERE it < 8 GROUP BY 1, 2)
        |SELECT st AS state, p AS pi_fp FROM pi WHERE it = 8
        |ORDER BY state""".stripMargin) { (sp, d) =>
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val c = Tables.events(sp, d)
        .select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(wSeq).as("to_type"))
        .where(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .pinned // the loop re-reads it 8 times
      val rt = c.groupBy("from_type").agg(sum("n").as("tot"))
      val edges = c.join(rt, "from_type")
        .select(col("from_type"), col("to_type"), col("n"), col("tot"))
        .pinned
      var pi = rt.select(col("from_type").as("st"),
        lit(1000000000000L).as("p"))
      (1 to 8).foreach { _ =>
        pi = edges.join(broadcast(pi), col("from_type") === col("st"))
          .select(col("to_type"), expr("p * n div tot").as("contrib"))
          .groupBy(col("to_type").as("st"))
          .agg(sum("contrib").as("p"))
          .pinned
      }
      pi.select(col("st").as("state"), col("p").as("pi_fp")).orderBy("state")
    },

    // top event PATHS: the 10 most frequent 3-step per-user event-type
    // sequences — the path-discovery sibling of the pairwise Markov
    // transitions above (funnels you did not know to look for). The
    // window is per-user (natural hash partitioning, never a global
    // sort); the trigram count space is |types|^3 so the groupBy
    // collapses map-side, and the top-10 is a TakeOrderedAndProject —
    // per-partition heads only, no full sort at any scale.
    "events_path_topn" -> QueryDef(
      """WITH seq AS (
        |  SELECT event_type AS s1,
        |    LEAD(event_type, 1) OVER w AS s2,
        |    LEAD(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |SELECT s1, s2, s3, COUNT(*) AS n FROM seq WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT 10""".stripMargin) { (sp, d) =>
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      graft.Tables.events(sp, d)
        .select(col("event_type").as("s1"),
          lead(col("event_type"), 1).over(wSeq).as("s2"),
          lead(col("event_type"), 2).over(wSeq).as("s3"))
        .where(col("s3").isNotNull)
        .groupBy("s1", "s2", "s3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(10)
    },

    // gaps-and-islands: each user's LONGEST run of consecutive active
    // days (retention streaks), via the classic day_number - row_number
    // island key — consecutive days share it, any gap starts a new
    // island. The raw event stream first collapses to distinct
    // (user, day) — bounded by users x days, not events — so the two
    // per-user windows and the island aggregate run on the small
    // relation; everything stays keyed on user_id (one shuffle,
    // reused). Ties on length break to the earliest streak. Integer
    // days + dates only => hash-exact.
    "events_streaks" -> QueryDef(
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |n AS (SELECT user_id, day,
        |        date_diff('day', DATE '2024-01-01', day) AS dn,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |      FROM d),
        |i AS (SELECT user_id, MIN(day) AS streak_start, COUNT(*) AS streak_len
        |      FROM n GROUP BY user_id, dn - rn),
        |r AS (SELECT user_id, streak_start, streak_len,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY streak_len DESC, streak_start) AS rr FROM i)
        |SELECT user_id, streak_start, streak_len FROM r WHERE rr = 1
        |ORDER BY user_id""".stripMargin) { (sp, d) =>
      import org.apache.spark.sql.expressions.Window
      val days = graft.Tables.events(sp, d)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val n = days.select(col("user_id"), col("day"),
        datediff(col("day"), lit("2024-01-01").cast("date")).as("dn"),
        row_number().over(Window.partitionBy("user_id").orderBy("day")).as("rn"))
      n.groupBy(col("user_id"), (col("dn") - col("rn")).as("g"))
        .agg(min("day").as("streak_start"), count(lit(1)).as("streak_len"))
        .withColumn("rr", row_number().over(Window.partitionBy("user_id")
          .orderBy(col("streak_len").desc, col("streak_start"))))
        .where(col("rr") === 1)
        .select("user_id", "streak_start", "streak_len")
        .orderBy("user_id")
    },

    // RFM segmentation — the product-analytics workhorse: per user,
    // recency (days from last purchase to the fixed 2024-02-01
    // anchor), frequency (purchase count), monetary (cents total),
    // each quintile-scored by ntile(5) over a TOTAL order (metric,
    // then user_id) so the scores are deterministic at any
    // parallelism, then a rule segment. The per-user rollup is one
    // shuffle; the three ntiles run over the already-collapsed user
    // relation (users << events — same trade as window_ntile; a
    // 100M-user deployment swaps them for RankStats-style
    // range-partitioned global ranks, which this oracle twin pins the
    // semantics for). Integers everywhere => hash-exact.
    "events_rfm" -> QueryDef(
      """WITH u AS (
        |  SELECT user_id,
        |    date_diff('day', CAST(MAX(ts) AS DATE), DATE '2024-02-01') AS recency_days,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) AS monetary
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), sc AS (
        |  SELECT user_id, recency_days, frequency, monetary,
        |    CAST(NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT) AS r,
        |    CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f,
        |    CAST(NTILE(5) OVER (ORDER BY monetary, user_id) AS BIGINT) AS m
        |  FROM u)
        |SELECT user_id, recency_days, frequency, monetary, r, f, m,
        |  CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
        |       WHEN r <= 2 AND f >= 3 THEN 'at_risk'
        |       WHEN r <= 2 AND f <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS segment
        |FROM sc ORDER BY user_id""".stripMargin) { (sp, d) =>
      import org.apache.spark.sql.expressions.Window
      val u = graft.Tables.events(sp, d)
        .where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(
          datediff(lit("2024-02-01").cast("date"), max("ts").cast("date")).as("recency_days"),
          count(lit(1)).as("frequency"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("monetary"))
      val sc = u.select(col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
        ntile(5).over(Window.orderBy(col("recency_days").desc, col("user_id")))
          .cast("long").as("r"),
        ntile(5).over(Window.orderBy(col("frequency"), col("user_id")))
          .cast("long").as("f"),
        ntile(5).over(Window.orderBy(col("monetary"), col("user_id")))
          .cast("long").as("m"))
      sc.withColumn("segment",
          when(col("r") >= 4 && col("f") >= 4 && col("m") >= 4, "champion")
            .when(col("r") <= 2 && col("f") >= 3, "at_risk")
            .when(col("r") <= 2 && col("f") <= 2, "hibernating")
            .otherwise("regular"))
        .orderBy("user_id")
    },

    // day-of-week seasonality profile: per-type dow means against the
    // type's overall mean — the seasonal-index decomposition a
    // forecasting pipeline starts from. Integer sums; each mean and
    // the index are single IEEE divisions of exact integers, so both
    // engines produce identical doubles. (Spark's dayofweek is
    // 1=Sunday..7; DuckDB's is 0=Sunday..6 — aligned via -1.)
    "events_seasonality" -> QueryDef(
      """WITH base AS (
        |  SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
        |         CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events),
        |g AS (SELECT event_type, dow, COUNT(*) AS n, CAST(SUM(vc) AS BIGINT) AS s
        |      FROM base GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn,
        |        CAST(SUM(s) AS BIGINT) AS tsum FROM g GROUP BY 1)
        |SELECT event_type, dow, n,
        |  CAST(s AS DOUBLE)/n AS dow_mean_c,
        |  (CAST(s AS DOUBLE)/n) / (CAST(tsum AS DOUBLE)/tn) AS seasonal_idx
        |FROM g JOIN t USING (event_type)
        |ORDER BY event_type, dow""".stripMargin) { (sp, d) =>
      val base = graft.Tables.events(sp, d).select(
        col("event_type"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        expr("CAST(round(value*100) AS BIGINT)").as("vc"))
      val g = base.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n"), sum("vc").as("s"))
      val t = g.groupBy("event_type")
        .agg(sum("n").as("tn"), sum("s").as("tsum"))
      g.join(broadcast(t), "event_type")
        .select(col("event_type"), col("dow"), col("n"),
          (col("s").cast("double") / col("n")).as("dow_mean_c"),
          ((col("s").cast("double") / col("n")) /
            (col("tsum").cast("double") / col("tn"))).as("seasonal_idx"))
        .orderBy("event_type", "dow")
    },

    // cohort retention: users bucketed by first-signup day, counted
    // per day-offset of any later activity (0..7). Two user-keyed
    // shuffles (first-day agg, distinct activity) + one count-distinct.
    // BOT-CADENCE DETECTION — the trust-and-safety screen over event
    // streams: humans arrive with bursty, high-variance inter-event
    // gaps; scripts tick on a clock. Per user, the coefficient of
    // variation of inter-arrival gaps (std/mean, ppm) ranks accounts
    // by regularity — the 20 most metronomic surface for review.
    // Gap extraction is one lag window per user (the gap MULTISET is
    // invariant to tie order among equal timestamps, so the window is
    // deterministic); moments are exact BIGINTs in whole seconds
    // (second-scaled so squares stay far from BIGINT range at any
    // event volume); one fixed double-op close. Degenerate users
    // (all-zero gaps, < 5 gaps) are excluded rather than emitting an
    // infinity that engines format differently.
    "events_bot_detection" -> QueryDef(
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |d AS (
        |  SELECT user_id,
        |    (t - lag(t) OVER (PARTITION BY user_id ORDER BY t)) // 1000000 AS gap_s
        |  FROM g),
        |m AS (
        |  SELECT user_id, CAST(COUNT(gap_s) AS BIGINT) AS n,
        |    CAST(SUM(gap_s) AS BIGINT) AS s,
        |    CAST(SUM(gap_s * gap_s) AS BIGINT) AS q
        |  FROM d WHERE gap_s IS NOT NULL
        |  GROUP BY 1 HAVING COUNT(gap_s) >= 5 AND SUM(gap_s) > 0)
        |SELECT user_id, n, s,
        |  CAST(round(1000000 * sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
        |    / (CAST(s AS DOUBLE) / n)) AS BIGINT) AS cv_ppm
        |FROM m ORDER BY cv_ppm, user_id LIMIT 20""".stripMargin) { (sp, d) =>
      val g = graft.Tables.events(sp, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t"))
      val gaps = g.select(col("user_id"),
        expr("CAST((t - lag(t) OVER (PARTITION BY user_id ORDER BY t)) div 1000000 AS BIGINT)")
          .as("gap_s"))
      val m = gaps.where(col("gap_s").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("gap_s").as("s"),
          sum(col("gap_s") * col("gap_s")).as("q"))
        .where(col("n") >= 5 && col("s") > 0)
      m.select(col("user_id"), col("n"), col("s"),
          expr("""CAST(round(1000000 * sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
            / (CAST(s AS DOUBLE) / n)) AS BIGINT)""").as("cv_ppm"))
        .orderBy("cv_ppm", "user_id").limit(20)
    },

    // COHORT LIFETIME VALUE — the revenue companion to
    // events_retention's headcount triangle: users cohort by the WEEK
    // they first appear, purchase revenue rolls up per (cohort, weeks
    // since cohort), and a running sum per cohort yields the
    // cumulative-LTV curves finance teams read. Scale shape: the
    // first-seen aggregate and the purchase stream meet on ONE
    // user-keyed equi-join (both partial-agg collapsed first); the
    // running sum windows over the tiny (cohorts x offsets) triangle,
    // never events. All integer cents, truncating week division
    // identical on both engines.
    "events_cohort_ltv" -> QueryDef(
      """WITH u AS (
        |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
        |    CAST(round(value*100) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT cohort, datediff('day', cohort, wk) // 7 AS week_offset,
        |    CAST(SUM(v) AS BIGINT) AS rev_cents
        |  FROM r JOIN u ON r.user_id = u.user_id GROUP BY 1, 2)
        |SELECT cohort, week_offset, rev_cents,
        |  CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY week_offset
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_cents
        |FROM g ORDER BY cohort, week_offset""".stripMargin) { (sp, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables.events(sp, d)
      val u = ev.groupBy("user_id")
        .agg(min(date_trunc("week", col("ts"))).cast("date").as("cohort"))
      val r = ev.where(col("event_type") === "purchase")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"),
          expr("CAST(round(value*100) AS BIGINT)").as("v"))
      val g = r.join(u, "user_id")
        .groupBy(col("cohort"),
          expr("CAST(datediff(wk, cohort) AS BIGINT) div 7").as("week_offset"))
        .agg(sum("v").as("rev_cents"))
      val w = Window.partitionBy("cohort").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("cohort"), col("week_offset"), col("rev_cents"),
          sum("rev_cents").over(w).cast("long").as("cum_rev_cents"))
        .orderBy("cohort", "week_offset")
    },

    "events_retention" -> QueryDef(
      """WITH first_day AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT f.cohort AS cohort, datediff('day', f.cohort, a.day) AS day_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM activity a JOIN first_day f ON a.user_id = f.user_id
        |WHERE datediff('day', f.cohort, a.day) BETWEEN 0 AND 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (sp, d) =>
      val ev = graft.Tables.events(sp, d)
      val firstDay = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts").cast("date")).as("cohort"))
      val activity = ev.select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      activity.join(firstDay, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("long"))
        .where(col("day_offset").between(0, 7))
        .groupBy("cohort", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort", "day_offset")
    },

    // CONVERSION WINDOW — of users who ever viewed, how many
    // purchased within one hour of their FIRST view, and how fast?
    // The attribution-window primitive under every funnel SLA (" X%
    // convert within the hour"). Two per-user aggregate passes (first
    // view; earliest later purchase), both partial-aggregated
    // map-side on user_id — the purchase pass reuses the same
    // user-hash partitioning, so the fact shuffles once per pass and
    // never pairwise. Delays stay in exact integer MICROSECONDS
    // (epoch_us both engines) — no interval arithmetic, no
    // boundary-crossing datediff semantics to mismatch.
    "events_conversion_window" -> QueryDef(
      """WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS tp
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > v.tv GROUP BY 1),
        |j AS (SELECT v.user_id,
        |        CAST(epoch_us(p.tp) - epoch_us(v.tv) AS BIGINT) AS delay_us
        |      FROM v LEFT JOIN p ON v.user_id = p.user_id),
        |c AS (SELECT delay_us FROM j
        |      WHERE delay_us IS NOT NULL AND delay_us <= 3600000000)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewers,
        |  CAST(COUNT(*) AS BIGINT) AS n_converted,
        |  CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM v) AS BIGINT)
        |    AS conv_ppm,
        |  CASE WHEN COUNT(*) = 0 THEN NULL
        |       ELSE CAST(SUM(delay_us) // COUNT(*) // 1000 AS BIGINT)
        |  END AS mean_delay_ms
        |FROM c""".stripMargin) { (sp, d) =>
      val ev = graft.Tables.events(sp, d)
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("tv"))
        .pinned // used three times: purchase probe, join, count
      val p = ev.where(col("event_type") === "purchase")
        .join(v, "user_id")
        .where(col("ts") > col("tv"))
        .groupBy("user_id").agg(min("ts").as("tp"))
      val j = v.join(p, Seq("user_id"), "left")
        .select(expr("CAST(unix_micros(tp) - unix_micros(tv) AS BIGINT)")
          .as("delay_us"))
      val c = j.where(col("delay_us").isNotNull && col("delay_us") <= 3600000000L)
      c.agg(count(lit(1)).as("n_converted"), sum("delay_us").as("sd"))
        .crossJoin(broadcast(v.agg(count(lit(1)).as("n_viewers"))))
        .select(col("n_viewers"), col("n_converted"),
          expr("n_converted * 1000000 div n_viewers").as("conv_ppm"),
          when(col("n_converted") === 0, lit(null))
            .otherwise(expr("sd div n_converted div 1000")).as("mean_delay_ms"))
    },

    // KAPLAN-MEIER SURVIVAL — the product-limit estimator over
    // right-censored durations, the standard for time-to-convert /
    // time-to-churn with incomplete observation. Durations are days
    // from first view to first purchase; censoring is a deterministic
    // md5 draw (3..10 days — an administrative-cutoff stand-in that
    // EXERCISES shrinking risk sets, the part naive ECDFs get wrong).
    // The life table is exact integers (at-risk via a suffix-sum
    // window, per-time deaths/censorings, hazard ppm); the cumulative
    // product rides in LOG SPACE as a running sum of per-factor
    // micro-rounded ln(1 - d/n) terms (the ulp-safe grid idiom), one
    // exp at the end. Two shuffles: per-user durations, then the tiny
    // per-time table.
    "events_survival_km" -> QueryDef(
      """WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS tp
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > v.tv GROUP BY 1),
        |u AS (SELECT v.user_id,
        |        CAST(date_diff('day', v.tv, p.tp) AS BIGINT) AS conv_days,
        |        3 + CAST(concat('0x', substr(md5(concat('km-',
        |          CAST(v.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8 AS cens_days
        |      FROM v JOIN p ON v.user_id = p.user_id),
        |o AS (SELECT user_id, LEAST(conv_days, cens_days) AS t,
        |        conv_days <= cens_days AS ev FROM u),
        |lt AS (SELECT t, CAST(COUNT(CASE WHEN ev THEN 1 END) AS BIGINT) AS d,
        |         CAST(COUNT(CASE WHEN NOT ev THEN 1 END) AS BIGINT) AS c,
        |         CAST(SUM(COUNT(*)) OVER (ORDER BY t DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS n_risk
        |       FROM o GROUP BY t),
        |km AS (SELECT t, n_risk, d, c,
        |         CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm,
        |         CAST(SUM(CASE WHEN d > 0 AND d < n_risk
        |           THEN CAST(round(ln(CAST(n_risk - d AS DOUBLE)
        |                / CAST(n_risk AS DOUBLE)) * 1000000) AS BIGINT)
        |           ELSE 0 END) OVER (ORDER BY t
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS cum_ln_micro,
        |         MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        |       FROM lt)
        |SELECT t, n_risk, d, c, hazard_ppm, cum_ln_micro,
        |  CASE WHEN dead = 1 THEN 0
        |       ELSE CAST(round(exp(CAST(cum_ln_micro AS DOUBLE) / 1000000)
        |            * 1000000) AS BIGINT) END AS survival_ppm
        |FROM km ORDER BY t""".stripMargin) { (sp, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables.events(sp, d)
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("tv"))
        .pinned // purchase probe + duration join
      val p = ev.where(col("event_type") === "purchase")
        .join(v, "user_id").where(col("ts") > col("tv"))
        .groupBy("user_id").agg(min("ts").as("tp"))
      val u = v.join(p, "user_id")
        .select(col("user_id"),
          datediff(col("tp").cast("date"), col("tv").cast("date")).cast("long")
            .as("conv_days"),
          expr("""3 + CAST(conv(substring(md5(concat('km-',
                  CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 8""")
            .as("cens_days"))
      val o = u.select(least(col("conv_days"), col("cens_days")).as("t"),
        (col("conv_days") <= col("cens_days")).as("ev"))
      val wRisk = Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val lt = o.groupBy("t")
        .agg(count(when(col("ev"), 1)).as("d"),
          count(when(!col("ev"), 1)).as("c"),
          count(lit(1)).as("n_here"))
        .withColumn("n_risk", sum("n_here").over(wRisk).cast("long"))
        .drop("n_here")
      val wCum = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
      lt.withColumn("hazard_ppm", expr("d * 1000000 div n_risk"))
        .withColumn("cum_ln_micro", sum(
          when(col("d") > 0 && col("d") < col("n_risk"),
            expr("""CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                    / CAST(n_risk AS DOUBLE)) * 1000000) AS BIGINT)"""))
            .otherwise(lit(0L))).over(wCum).cast("long"))
        .withColumn("dead", max(when(col("d") === col("n_risk"), 1)
          .otherwise(0)).over(wCum))
        .select(col("t"), col("n_risk"), col("d"), col("c"), col("hazard_ppm"),
          col("cum_ln_micro"),
          when(col("dead") === 1, lit(0L))
            .otherwise(expr("""CAST(round(exp(CAST(cum_ln_micro AS DOUBLE)
                               / 1000000) * 1000000) AS BIGINT)"""))
            .as("survival_ppm"))
        .orderBy("t")
    },

    // AUDIENCE OVERLAP — exact pairwise user-set intersection and
    // Jaccard across event types: the segmentation question ("do
    // purchasers come from viewers?") and the EXACT twin the
    // HLL-sketch overlap estimators approximate at 100 TB. The
    // per-type user sets collapse to DISTINCT (user, type) FIRST, so
    // the pair join runs on audience-sized relations keyed by user —
    // intersection counts fall out of one partial-aggregated
    // self-join, never a cross of raw events. Jaccard in truncating
    // ppm off the inclusion-exclusion identity.
    "events_audience_overlap" -> QueryDef(
      """WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
        |sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM a GROUP BY 1),
        |ix AS (SELECT x.event_type AS t1, y.event_type AS t2,
        |         CAST(COUNT(*) AS BIGINT) AS both
        |       FROM a x JOIN a y
        |         ON x.user_id = y.user_id AND x.event_type < y.event_type
        |       GROUP BY 1, 2)
        |SELECT ix.t1, ix.t2, s1.n AS n1, s2.n AS n2, ix.both,
        |  CAST(ix.both * 1000000 // (s1.n + s2.n - ix.both) AS BIGINT)
        |    AS jaccard_ppm
        |FROM ix JOIN sz s1 ON ix.t1 = s1.event_type
        |JOIN sz s2 ON ix.t2 = s2.event_type
        |ORDER BY t1, t2""".stripMargin) { (sp, d) =>
      val a = graft.Tables.events(sp, d)
        .select("event_type", "user_id").distinct()
        .pinned // sizes + both sides of the pair join
      val sz = a.groupBy("event_type").agg(count(lit(1)).as("n"))
      val ix = a.as("x").join(a.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("t1"), col("y.event_type").as("t2"))
        .agg(count(lit(1)).as("both"))
      ix.join(broadcast(sz.select(col("event_type").as("t1"), col("n").as("n1"))), "t1")
        .join(broadcast(sz.select(col("event_type").as("t2"), col("n").as("n2"))), "t2")
        .select(col("t1"), col("t2"), col("n1"), col("n2"), col("both"),
          expr("both * 1000000 div (n1 + n2 - both)").as("jaccard_ppm"))
        .orderBy("t1", "t2")
    }
  )
}
