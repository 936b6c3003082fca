package graft.rel

import org.apache.spark.sql.functions._

import graft.QueryDef

/** Event-analytics operators over the events table: ordered funnels
  * and cohort retention — the product-analytics surface an analytics
  * engine is expected to ship alongside the relational core.
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

  val defs: Map[String, QueryDef] = Map(

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
      val s = w.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("t")).as("t1"))
      val v = w.where(col("event_type") === "view").as("w")
        .join(s.as("s"), col("w.user_id") === col("s.user_id") && col("w.t") > col("s.t1"))
        .groupBy(col("w.user_id").as("user_id")).agg(min(col("w.t")).as("t2"))
      val p = w.where(col("event_type") === "purchase").as("w")
        .join(v.as("v"), col("w.user_id") === col("v.user_id") && col("w.t") > col("v.t2"))
        .groupBy(col("w.user_id").as("user_id")).agg(min(col("w.t")).as("t3"))
      s.select(col("user_id"), col("t1"))
        .join(v.select(col("user_id"), lit(1).as("hit_v")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), lit(1).as("hit_p")), Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1) + when(col("hit_v").isNull, 0).otherwise(1)
            + when(col("hit_p").isNull, 0).otherwise(1)).cast("long").as("stage"))
        .orderBy("user_id")
    },

    // cohort retention: users bucketed by first-signup day, counted
    // per day-offset of any later activity (0..7). Two user-keyed
    // shuffles (first-day agg, distinct activity) + one count-distinct.
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
    }
  )
}
