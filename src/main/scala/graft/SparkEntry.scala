package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operator entries live in per-domain modules and are assembled
  * here: [[graft.tick.TickQueries]] (TickDB parity, SURVEY §2.A),
  * [[graft.rel.RelQueries]] (relational coverage, §2.B), with text /
  * vector / streaming modules joining as they land.
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    tick.TickQueries.defs ++ tick.StoreQueries.defs ++ rel.RelQueries.defs ++
      rel.TpchQueries.defs ++
      rel.EventQueries.defs ++ rel.AnalyticsQueries.defs ++
      rel.FeatureQueries.defs ++ rel.GraphExtras.defs ++
      text.TextQueries.defs ++ text.CorpusQueries.defs ++
      text.QualityClassifier.defs ++ vec.VecQueries.defs ++
      vec.VecAnalytics.defs ++ mm.MmQueries.defs ++ streaming.StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference README's own example query (README.md:32-44): avg
    * over 2-minute buckets in a range on one index.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("tick_avg_2min")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, d) => name -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }

  /** Idempotent fixture builders for the store-building bench entries
    * (cached stores, bucketed tables, streamed drains). Bench runs and
    * times these BEFORE the laps, so lap times measure query plans,
    * not fixture construction; correctness never depends on them (the
    * query defs invoke the same cached builders themselves).
    */
  def benchSetups: Map[String, (SparkSession, String) => Unit] =
    tick.StoreQueries.benchSetups ++ rel.RelQueries.benchSetups ++
      rel.AnalyticsQueries.benchSetups ++
      streaming.StreamingQueries.benchSetups ++ vec.VecAnalytics.benchSetups ++
      text.TextQueries.benchSetups ++ text.QualityClassifier.benchSetups
}
