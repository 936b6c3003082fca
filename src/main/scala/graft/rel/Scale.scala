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

  /** Salted equi-join for a skew-heavy probe side: the big side's rows
    * scatter across `salts` sub-keys (deterministic hash of the whole
    * row — distribution-only, never affects results), the small side
    * replicates once per salt. A hot key thus spreads over `salts`
    * tasks instead of one straggler.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts.toLong)).cast("int"))
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
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(valueCol).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count"))
  }
}
