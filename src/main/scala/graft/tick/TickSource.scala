package graft.tick

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A tick-shaped input: a time-ordered series with named numeric
  * fields, addressable by a series id ("index" in the reference's
  * vocabulary, `database.go:20-28`).
  *
  * Implementations resolve field names to columns lazily so Catalyst
  * prunes unreferenced physical columns out of the scan — the analog of
  * the reference's projection-on-read (`cursor.go:274-288`), but pushed
  * all the way into the Parquet reader.
  */
trait TickSource {
  /** The raw frame (unfiltered). */
  def frame: DataFrame
  /** Event-time column (TimestampType, UTC). */
  def ts: Column
  /** Series-id predicate for a given index name. */
  def indexPredicate(index: String): Column
  /** Resolve a tick field name to a DoubleType column. */
  def field(name: String): Column

  // ---- oracle-SQL mirrors (DuckDB dialect, same semantics) ----
  def tableSql: String
  def tsSql: String
  def indexPredicateSql(index: String): String
  def fieldSql(name: String): String
}

/** The driver testdata `events` table viewed as a tick store
  * (FIXTURES.md: `event_type` = index, `ts` = time, `value` = the
  * numeric field, `props` = JSON side-fields).
  */
final case class EventsSource(spark: SparkSession, dir: String) extends TickSource {
  // lazy: the SQL-dialect half of this source is usable without a live
  // session (oracle-SQL generation at class-load time)
  override lazy val frame: DataFrame = graft.Tables.events(spark, dir)
  override def ts: Column = frame("ts")
  override def indexPredicate(index: String): Column = frame("event_type") === index
  override def field(name: String): Column = name match {
    case "value" => frame("value")
    case other   => get_json_object(frame("props"), s"$$.$other").cast("double")
  }

  override def tableSql: String = "events"
  override def tsSql: String = "ts"
  override def indexPredicateSql(index: String): String = s"event_type = '$index'"
  override def fieldSql(name: String): String = name match {
    case "value" => "\"value\""
    case other   => s"CAST(props->>'$$.$other' AS DOUBLE)"
  }
}
