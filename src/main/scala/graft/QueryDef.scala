package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator/query in the driver contract: a DataFrame builder
  * over a scale-factor dir, plus (when SQL-expressible) the equivalent
  * DuckDB oracle SQL over the same parquet tables. Queries without
  * oracle SQL get the driver's weaker rows-only check.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracle))
  def rowsOnly(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None)
}
