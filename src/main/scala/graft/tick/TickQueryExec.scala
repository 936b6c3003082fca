package graft.tick

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Executes a [[TickQuery]] against a [[TickSource]] by lowering it to
  * a declarative DataFrame plan — the Spark-native replacement for the
  * reference's cursor walk over its aggregation pyramid
  * (reference `db.go:110-125`, `cursor.go:66-173, 269-352`).
  *
  * Plan shape: scan → predicate(index, [from,to)) → groupBy(bucket) →
  * agg(reducer per field) → orderBy(bucket). Catalyst pushes the
  * predicates into the Parquet scan (partition pruning + row-group
  * skipping replace the reference's tree `seek`), and its
  * partial+final hash aggregation is the runtime analog of the
  * reference's pyramid leaves + interior merges (`node.go:523-579`).
  *
  * Output: `bucket TIMESTAMP, <field>_<reducer> ...` for grouped
  * queries; `ts, <field>...` raw points otherwise. Ascending bucket/ts
  * order, matching the reference's in-order traversal
  * (`cursor.go:76-118`).
  */
object TickQueryExec {

  /** Run with native double aggregation (fast path). */
  def run(src: TickSource, q: TickQuery): DataFrame = build(src, q, exact = false)

  /** Run with order-independent (decimal-accumulated) sums/avgs, for
    * bit-exact comparison against a single-threaded oracle engine.
    */
  def runExact(src: TickSource, q: TickQuery): DataFrame = build(src, q, exact = true)

  def outName(field: String, reducer: String): String = s"${field}_${reducer}"

  private def build(src: TickSource, q: TickQuery, exact: Boolean): DataFrame = {
    require(q.fields.nonEmpty,
      "tick query must request at least one field (empty \"fields\" document)")
    val indexed = src.frame.where(src.indexPredicate(q.index))
    val filtered = src.rangePredicate(q.from, q.to)
      .map(indexed.where).getOrElse(indexed)
    q.group match {
      case Some(spec) =>
        val aggs = q.fields.map { case (f, red) =>
          val v = src.field(f)
          val c = if (exact) Reducers.exactColumn(red, v, src.ts)
                  else Reducers.column(red, v, src.ts)
          c.as(outName(f, red))
        }
        filtered
          .groupBy(spec.bucket(src.ts).as("bucket"))
          .agg(aggs.head, aggs.tail: _*)
          .orderBy("bucket")
      case None =>
        // raw level: one row per point, requested fields only. When the
        // source has an exact ns key it rides along (LAST column, so
        // field positions stay stable) — the µs `ts` alone would
        // collapse ns-distinct points (reference keys are int64 ns,
        // point.go:8-11)
        val cols = (src.ts.as("ts") +: q.fields.map { case (f, _) => src.field(f).as(f) }) ++
          src.tsNs.map(_.as("ts_ns")).toSeq
        src.tsNs match {
          case Some(_) => filtered.select(cols: _*).orderBy("ts_ns")
          case None    => filtered.select(cols: _*).orderBy("ts")
        }
    }
  }

  private def truncUs(i: Instant): Instant =
    Instant.ofEpochSecond(i.getEpochSecond, (i.getNano / 1000L) * 1000L)

  private val sqlTsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  /** DuckDB SQL with identical semantics to [[runExact]], for the
    * driver's oracle comparison.
    */
  def oracleSql(src: TickSource, q: TickQuery): String = {
    val conds = Seq(src.indexPredicateSql(q.index)) ++
      q.from.map(i => s"${src.tsSql} >= TIMESTAMP '${sqlTsFmt.format(truncUs(i))}'") ++
      q.to.map(i => s"${src.tsSql} < TIMESTAMP '${sqlTsFmt.format(truncUs(i))}'")
    val where = conds.mkString(" AND ")
    q.group match {
      case Some(spec) =>
        val bucket = spec.bucketSql(src.tsSql)
        val aggs = q.fields.map { case (f, red) =>
          s"${Reducers.exactSql(red, src.fieldSql(f), src.tsSql)} AS ${outName(f, red)}"
        }.mkString(", ")
        s"SELECT $bucket AS bucket, $aggs FROM ${src.tableSql} " +
          s"WHERE $where GROUP BY 1 ORDER BY 1"
      case None =>
        val cols = q.fields.map { case (f, _) => s"${src.fieldSql(f)} AS ${quoteIdent(f)}" }
        val nsCol = src.tsNsSql.map(e => s"$e AS ts_ns").toSeq
        val sel = ((s"${src.tsSql} AS ts" +: cols) ++ nsCol).mkString(", ")
        val ord = if (src.tsNsSql.isDefined) "ts_ns" else "ts"
        s"SELECT $sel FROM ${src.tableSql} WHERE $where ORDER BY $ord"
    }
  }

  private def quoteIdent(s: String): String = "\"" + s + "\""
}
