package graft.tick

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-bucket unit for tick group-by queries.
  *
  * Mirrors the reference's group units (reference `query.go:20-59`:
  * second(s)/minute(s)/hour(s)/day(s)/month(s)/year(s)) with the fixes
  * documented in SURVEY.md §2.A.2: the integer multiplier is honored
  * (the reference parses and drops it, `db.go:110-125`) and "seconds"
  * really means seconds (the reference maps it to minutes,
  * `query.go:30-33`).
  */
sealed abstract class GroupUnit(val name: String, val fixedSeconds: Long) {
  /** Calendar units (month/year) have no fixed width in seconds. */
  def isCalendar: Boolean = fixedSeconds == 0L
}

object GroupUnit {
  case object Second extends GroupUnit("second", 1L)
  case object Minute extends GroupUnit("minute", 60L)
  case object Hour   extends GroupUnit("hour", 3600L)
  case object Day    extends GroupUnit("day", 86400L)
  case object Month  extends GroupUnit("month", 0L)
  case object Year   extends GroupUnit("year", 0L)

  val all: Seq[GroupUnit] = Seq(Second, Minute, Hour, Day, Month, Year)
  private val byName: Map[String, GroupUnit] = all.map(u => u.name -> u).toMap

  def forName(s: String): Option[GroupUnit] = byName.get(s)
}

/** Parsed group spec, e.g. "2minutes" -> GroupSpec(2, Minute).
  *
  * Bucketing is epoch-aligned in UTC for fixed-width units and
  * calendar-aligned for month/year, deliberately diverging from the
  * reference's server-local-timezone truncation (`timeutil.go:56-71`);
  * see SURVEY.md §2.A.2 item 8.
  */
final case class GroupSpec(count: Int, unit: GroupUnit) {
  require(count >= 1, s"group multiplier must be >= 1, got $count")

  /** Bucket-start timestamp column for a TimestampType input column.
    *
    * Fixed-width units use integer arithmetic on epoch microseconds so
    * the exact same expression is expressible in any ANSI engine;
    * calendar units use date_trunc plus month arithmetic for
    * multipliers > 1.
    */
  def bucket(ts: Column): Column = unit match {
    case GroupUnit.Month if count == 1 => date_trunc("month", ts)
    case GroupUnit.Year  if count == 1 => date_trunc("year", ts)
    case GroupUnit.Month =>
      // months since epoch, floored to a multiple of `count`
      val m = (year(ts) - lit(1970)) * lit(12) + month(ts) - lit(1)
      val b = floor(m / lit(count)).cast("long") * lit(count)
      make_timestamp(
        // floor, not the cast's truncate-toward-zero: b = -6 (Jul 1969)
        // must map to year 1969, not 1970
        floor(b / lit(12)).cast("int") + lit(1970),
        pmod(b, lit(12)).cast("int") + lit(1),
        lit(1), lit(0), lit(0), lit(0))
    case GroupUnit.Year =>
      val y = floor((year(ts) - lit(1970)) / lit(count)).cast("long") * lit(count)
      make_timestamp(y.cast("int") + lit(1970), lit(1), lit(1), lit(0), lit(0), lit(0))
    case u =>
      val widthUs = lit(u.fixedSeconds * count * 1000000L)
      // a - pmod(a, w): exact integer floor-to-multiple. Double
      // division would truncate toward zero (wrong pre-1970) and lose
      // precision for epochs beyond 2^53 µs.
      timestamp_micros(unix_micros(ts) - pmod(unix_micros(ts), widthUs))
  }

  /** DuckDB SQL expression computing the identical bucket for column
    * expression `tsExpr` — used to generate oracle SQL that matches
    * [[bucket]] bit-for-bit.
    */
  def bucketSql(tsExpr: String): String = unit match {
    // CAST: DuckDB's date_trunc('month'|'year') returns DATE, Spark's a TIMESTAMP
    case GroupUnit.Month if count == 1 => s"CAST(date_trunc('month', $tsExpr) AS TIMESTAMP)"
    case GroupUnit.Year  if count == 1 => s"CAST(date_trunc('year', $tsExpr) AS TIMESTAMP)"
    case GroupUnit.Month =>
      val m = s"((year($tsExpr) - 1970) * 12 + month($tsExpr) - 1)"
      val b = s"(CAST(floor($m / $count) AS BIGINT) * $count)"
      // (+12)%12: positive mod, mirroring Spark's pmod for pre-1970 b<0
      s"make_timestamp(CAST($b // 12 AS BIGINT) + 1970, (($b % 12 + 12) % 12) + 1, 1, 0, 0, 0)"
    case GroupUnit.Year =>
      val y = s"(CAST(floor((year($tsExpr) - 1970) / $count) AS BIGINT) * $count)"
      s"make_timestamp($y + 1970, 1, 1, 0, 0, 0)"
    case u =>
      val widthUs = u.fixedSeconds * count * 1000000L
      s"make_timestamp((epoch_us($tsExpr) // ${widthUs}) * ${widthUs})"
  }
}

object GroupSpec {
  private val Pattern = """^\s*(\d*)\s*(second|minute|hour|day|month|year)s?\s*$""".r

  /** Parse "5minutes", "hour", "2 days", ... (reference `query.go:20-59`). */
  def parse(s: String): GroupSpec = s.toLowerCase match {
    case Pattern(n, u) =>
      val count = if (n.isEmpty) 1 else n.toInt
      GroupSpec(count, GroupUnit.forName(u).get)
    case _ =>
      throw new IllegalArgumentException(s"unparseable group spec: '$s'")
  }
}
