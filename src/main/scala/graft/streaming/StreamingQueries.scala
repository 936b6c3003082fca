package graft.streaming

import graft.QueryDef

/** Verify-gate entry proving the Structured Streaming path end-to-end:
  * the streamed windowed aggregate must equal the batch equivalent the
  * oracle computes.
  */
object StreamingQueries {
  val defs: Map[String, QueryDef] = Map(
    // gap-based sessionization (30 min), batch twin of the stateful
    // streaming operator — oracle-checked
    "sessionize_batch" -> QueryDef(Sessionize.batchOracleSql(1800000000L)) { (s, d) =>
      Sessionize.batch(graft.Tables.events(s, d), 1800000000L)
        .orderBy("user_id", "session_start")
    },

    "streaming_window_agg" -> QueryDef(
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST("value" AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      StreamingOps.windowAggOnce(s, d).orderBy("bucket", "event_type")
    },

    // streaming dedup == batch distinct (exactly-once key emission)
    "streaming_dedup" -> QueryDef(
      """SELECT event_type, COUNT(*) AS n_keys
        |FROM (SELECT DISTINCT user_id, event_type FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      StreamingOps.streamDedupOnce(s, d)
    }
  )
}
