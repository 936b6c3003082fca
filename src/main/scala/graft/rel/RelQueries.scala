package graft.rel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** General relational operator coverage (SURVEY.md §2.B): the standard
  * operator categories the reference lacks entirely, each exercised on
  * the TPC-H-ish testdata with a DuckDB oracle.
  *
  * Determinism rules (SURVEY §5.2): every query ORDER BYs a stable key;
  * double sums/avgs accumulate in decimal and surface as double so the
  * result is independent of Spark's partition-parallel addition order.
  */
object RelQueries {

  /** Order-independent double sum: exact decimal accumulation cast back
    * to double (see Reducers.exactColumn for rationale).
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(29,9)")).cast("double")
  private def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(29,9))) AS DOUBLE)"

  val defs: Map[String, QueryDef] = Map(

    // ---- aggregation: hash agg, partial+final (TPC-H Q1 shape) ----
    "q1_agg" -> QueryDef(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }
  )
}
