package graft.tick

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's per-field reducers (reference `cursor.go:293-346`,
  * pyramid maintenance `node.go:523-579`): sum, max, min, first, last,
  * count, avg, ma (alias of avg).
  *
  * Implemented with the *fixed* semantics of SURVEY.md §2.A.2: `count`
  * is a real long count (the reference returns `last` and uses uint16),
  * `min` is a real min (the reference's merge keeps the larger value),
  * and first/last are deterministic via min_by/max_by on the timestamp
  * (Spark's bare first()/last() are partition-order-sensitive).
  *
  * Two flavors:
  *  - [[column]]: native double aggregation — fastest, used by the
  *    engine API at scale.
  *  - [[exactColumn]] / [[exactSql]]: decimal-accumulated sums/avgs so
  *    the result is independent of addition order and hash-matches a
  *    single-threaded oracle engine bit-for-bit (floating-point sums
  *    are order-dependent; a shuffle-parallel engine cannot otherwise
  *    guarantee the oracle's exact bits).
  */
object Reducers {
  val names: Seq[String] = Seq("sum", "max", "min", "first", "last", "count", "avg", "ma")

  /** Native reducer column: `v` is the field value, `ord` the ordering
    * column (timestamp) for first/last determinism.
    */
  def column(reducer: String, v: Column, ord: Column): Column = reducer match {
    case "sum"         => sum(v)
    case "max"         => max(v)
    case "min"         => min(v)
    case "first"       => min_by(v, ord)
    case "last"        => max_by(v, ord)
    case "count"       => count(v)
    case "avg" | "ma"  => avg(v)
    case other => throw new IllegalArgumentException(s"unknown reducer: '$other'")
  }

  /** Cross-engine-deterministic reducer: sums/avgs accumulate in
    * decimal (exact, order-independent) and surface as double.
    *
    * Scale 4, not higher: DuckDB casts DECIMAL->DOUBLE through the
    * scaled integer, which above 2^53 is itself lossy — at scale 4 the
    * scaled sum stays exactly representable, so both engines produce
    * the identical double. (Testdata values have <=2 decimals; products
    * of two such values <=4 — scale 4 loses nothing.)
    */
  def exactColumn(reducer: String, v: Column, ord: Column): Column = {
    val dec = v.cast("decimal(20,4)")
    reducer match {
      case "sum"        => sum(dec).cast("double")
      // cast the exact sum to double BEFORE dividing: double/long division
      // is bit-identical across engines, decimal division rounding is not
      case "avg" | "ma" => sum(dec).cast("double") / count(v)
      case _            => column(reducer, v, ord)
    }
  }

  /** DuckDB SQL equivalent of [[exactColumn]] over value expression
    * `v` and ordering expression `ord`.
    */
  def exactSql(reducer: String, v: String, ord: String): String = reducer match {
    case "sum"        => s"CAST(SUM(CAST($v AS DECIMAL(20,4))) AS DOUBLE)"
    case "avg" | "ma" => s"CAST(SUM(CAST($v AS DECIMAL(20,4))) AS DOUBLE) / COUNT($v)"
    case "max"        => s"MAX($v)"
    case "min"        => s"MIN($v)"
    case "first"      => s"MIN_BY($v, $ord)"
    case "last"       => s"MAX_BY($v, $ord)"
    case "count"      => s"COUNT($v)"
    case other => throw new IllegalArgumentException(s"unknown reducer: '$other'")
  }
}
