package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: split each user's event stream into sessions
  * separated by inactivity gaps. Two implementations with identical
  * semantics:
  *
  *  - [[batch]]: lag + running-sum-of-boundaries window plan (one
  *    shuffle by user) — SQL-expressible, oracle-checked.
  *  - [[streamingSessions]]: `flatMapGroupsWithState` keeping the open
  *    session in state per user and emitting sessions as they close —
  *    the stateful-streaming operator surface (SURVEY §2.B streaming
  *    row) the batch plan has no analog for.
  */
object Sessionize {

  /** Per-session rows: user_id, session_start (µs ts), n_events,
    * total_value — sessions split at gaps > gapUs.
    */
  def batch(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us").asc)
    val run = byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        timestamp_micros(min(col("us"))).as("session_start"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
      .drop("session_idx")
  }

  /** DuckDB mirror of [[batch]]. */
  def batchOracleSql(gapUs: Long): String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS us, "value",
       |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
       |  FROM events),
       |s AS (
       |  SELECT user_id, us, "value",
       |    SUM(CASE WHEN prev IS NULL OR us - prev > $gapUs THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM e)
       |SELECT user_id, make_timestamp(MIN(us)) AS session_start,
       |  COUNT(*) AS n_events,
       |  CAST(SUM(CAST("value" AS DECIMAL(20,4))) AS DOUBLE) AS total_value
       |FROM s GROUP BY user_id, session_idx
       |ORDER BY user_id, session_start""".stripMargin

  final case class SessionEvent(user_id: Long, us: Long, value: Double)
  final case class Session(user_id: Long, session_start: Long, n_events: Long, total_value: Double)
  final case class OpenSession(start: Long, lastUs: Long, n: Long, total: Double)

  /** Stateful streaming sessionization: state = the user's open
    * session; a batch's events extend it or close it (emitting the
    * closed session) when the gap exceeds `gapUs`. Open sessions stay
    * in state across micro-batches (and would time out via event-time
    * timeout in a production watermark setup).
    */
  def streamingSessions(
      events: Dataset[SessionEvent], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) => {
          val sorted = it.toArray.sortBy(_.us)
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { e =>
            open match {
              case Some(o) if e.us - o.lastUs <= gapUs =>
                // late cross-batch events must not regress the session
                // frontier (a shrunken lastUs would wrongly close the
                // session on the next in-gap event) nor inflate start
                open = Some(OpenSession(math.min(o.start, e.us),
                  math.max(o.lastUs, e.us), o.n + 1, o.total + e.value))
              case Some(o) =>
                closed += Session(user, o.start, o.n, o.total)
                open = Some(OpenSession(e.us, e.us, 1, e.value))
              case None =>
                open = Some(OpenSession(e.us, e.us, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.iterator
        })
  }
}
