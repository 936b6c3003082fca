package graft.tick

import org.scalatest.funsuite.AnyFunSuite

/** Pure (session-free) tests of the tick query front-end. */
class TickCoreSpec extends AnyFunSuite {

  test("GroupSpec parses all units, plurals, and multipliers") {
    assert(GroupSpec.parse("second") == GroupSpec(1, GroupUnit.Second))
    assert(GroupSpec.parse("seconds") == GroupSpec(1, GroupUnit.Second))
    assert(GroupSpec.parse("5minutes") == GroupSpec(5, GroupUnit.Minute))
    assert(GroupSpec.parse("2 minutes") == GroupSpec(2, GroupUnit.Minute))
    assert(GroupSpec.parse("hour") == GroupSpec(1, GroupUnit.Hour))
    assert(GroupSpec.parse("3days") == GroupSpec(3, GroupUnit.Day))
    assert(GroupSpec.parse("month") == GroupSpec(1, GroupUnit.Month))
    assert(GroupSpec.parse("10years") == GroupSpec(10, GroupUnit.Year))
    assertThrows[IllegalArgumentException](GroupSpec.parse("fortnight"))
    assertThrows[IllegalArgumentException](GroupSpec.parse(""))
  }

  test("seconds means seconds (reference maps it to minutes — fixed, SURVEY 2.A.2)") {
    assert(GroupSpec.parse("seconds").unit == GroupUnit.Second)
  }

  test("TickQuery decodes the reference README's query document") {
    val q = TickQuery.fromJson(
      """{"index": "index1",
        | "from": "2016-08-28T08:00:00Z", "to": "2016-08-31T18:00:59Z",
        | "group": "2minutes",
        | "fields": {"open": {"reducer": "avg"}}}""".stripMargin)
    assert(q.index == "index1")
    assert(q.from.get == java.time.Instant.parse("2016-08-28T08:00:00Z"))
    assert(q.to.get == java.time.Instant.parse("2016-08-31T18:00:59Z"))
    assert(q.group.contains(GroupSpec(2, GroupUnit.Minute)))
    assert(q.fields == Seq("open" -> "avg"))
  }

  test("parseTime accepts RFC3339, space layouts, bare dates, unix nanos") {
    import TickQuery.parseTime
    val want = java.time.Instant.parse("2024-01-02T03:04:05Z")
    assert(parseTime("2024-01-02T03:04:05Z") == want)
    assert(parseTime("2024-01-02T03:04:05+00:00") == want)
    assert(parseTime("2024-01-02 03:04:05") == want)
    assert(parseTime("2024-01-02") == java.time.Instant.parse("2024-01-02T00:00:00Z"))
    assert(parseTime("1704164645000000000") == want)
    assert(parseTime("1704164645000") == want) // unix millis
    assert(parseTime("1704164645") == want)    // unix seconds
    assertThrows[IllegalArgumentException](parseTime("not-a-time"))
  }

  test("reducer names cover the reference's surface incl. the ma alias") {
    Reducers.names.foreach { r =>
      // must not throw for any declared reducer
      Reducers.exactSql(r, "v", "ts")
    }
    assert(Reducers.exactSql("ma", "v", "ts") == Reducers.exactSql("avg", "v", "ts"))
    assertThrows[IllegalArgumentException](Reducers.exactSql("median", "v", "ts"))
  }
}
