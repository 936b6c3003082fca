package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class utilities (SURVEY §7.5 100-TB
  * posture): key-skew salting and bucketed co-located joins. AQE's
  * skew-join handling covers sort-merge joins automatically; explicit
  * salting remains the tool for skewed aggregations and for joins AQE
  * can't split (e.g. when the skewed side feeds other operators).
  */
object Scale {

  /** Row-position salt: monotonically_increasing_id is dense within a
    * partition, so pmod spreads rows round-robin across `salts` even
    * when the rows are byte-identical (a whole-row hash would send a
    * hot key's duplicate rows to one salt — the exact straggler the
    * salt exists to break up) and works for any column types
    * (hash expressions reject MapType). Distribution-only; never
    * affects results.
    */
  private def rowSalt(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int")

  /** Join types where replicating the small side per salt is sound:
    * each big row carries one salt, so any join that is driven per
    * big-side row works; right/full outer would emit the small side's
    * unmatched replicas `salts` times.
    */
  private val saltableJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")

  /** Salted equi-join for a skew-heavy probe side: the big side's rows
    * scatter across `salts` sub-keys, the small side replicates once
    * per salt. A hot key thus spreads over `salts` tasks instead of
    * one straggler. Restricted to big-side-driven join types — see
    * [[saltableJoinTypes]].
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(saltableJoinTypes(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports ${saltableJoinTypes.mkString("/")}, not '$joinType': " +
        "right/full outer would duplicate unmatched small-side rows per salt")
    val bigS = big.withColumn("__salt", rowSalt(salts))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Salted two-phase aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final-merge on key. `partials`
    * maps each aggregate to its (partial, merge) column pair.
    */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: Column, salts: Int): DataFrame = {
    df.withColumn("__salt", rowSalt(salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(valueCol).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count"))
  }
}
