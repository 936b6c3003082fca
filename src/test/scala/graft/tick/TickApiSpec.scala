package graft.tick

import graft.SparkSpec

/** End-to-end wire parity: drive the reference's README examples
  * (README.md:22-53) through the JSON façade.
  */
class TickApiSpec extends SparkSpec {

  private lazy val store: TickStore = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_test_api"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    new TickStore(root)
  }

  test("the README lifecycle: create, ingest, query, get, delete") {
    TickApi.createDb(spark, store, "db1")
    assert(TickApi.listDbs(spark, store) == """["db1"]""")

    // the README's own ingest document (README.md:22-26)
    val n = TickApi.ingest(spark, store, "db1",
      """[{"index": "index1", "time": "2016-08-28T21:24:00Z",
        |  "value": {"open": 10.1, "close": 10.2}},
        | {"index": "index1", "time": "2016-08-28T21:25:30Z",
        |  "value": {"open": 10.3, "close": 10.4}},
        | {"index": "index1", "time": "2016-08-28T21:26:00Z",
        |  "value": {"open": 10.5}}]""".stripMargin)
    assert(n == 3)

    // the README's own query document (README.md:32-44): 2-minute avg
    val res = TickApi.query(spark, store, "db1",
      """{"index": "index1",
        |"from": "2016-08-28T08:00:00Z", "to": "2016-08-31T18:00:59Z",
        |"group": "2minutes",
        |"fields": {"open": {"reducer": "avg"}}}""".stripMargin)
    // buckets: 21:24 holds open 10.1 and 10.3 -> avg 10.2; 21:26 -> 10.5
    assert(res ==
      """[{"Timestamp":1472419440000000000,"Value":{"open":10.2}},""" +
      """{"Timestamp":1472419560000000000,"Value":{"open":10.5}}]""")

    // legacy zero-fill: a requested field missing from a bucket is 0.0
    val zf = TickApi.query(spark, store, "db1",
      """{"index": "index1", "group": "2minutes",
        |"fields": {"close": {"reducer": "last"}}}""".stripMargin)
    assert(zf.contains(""""close":0.0"""), s"zero-fill missing: $zf")

    // exact point get (A7)
    assert(TickApi.getPoint(spark, store, "db1", "index1", "2016-08-28T21:26:00Z")
      .contains("""{"open":10.5}"""))
    assert(TickApi.getPoint(spark, store, "db1", "index1", "2016-08-28T21:26:01Z").isEmpty)

    // range delete (README.md:46-53), half-open
    TickApi.deleteRange(spark, store, "db1", "index1",
      """{"from": "2016-08-28T21:25:00Z", "to": "2016-08-28T21:26:00Z"}""")
    assert(store.readIndex(spark, "db1", "index1").count() == 2)

    TickApi.dropIndex(spark, store, "db1", "index1")
    assert(store.listIndexes(spark, "db1").isEmpty)
    TickApi.dropDb(spark, store, "db1")
    assert(TickApi.listDbs(spark, store) == "[]")
  }

  test("parseTime accepts the timelib layout family") {
    import TickQuery.parseTimeNs
    val base = parseTimeNs("2016-08-28T21:24:00Z")
    // minute-precision wall times
    assert(parseTimeNs("2016-08-28T21:24") == base)
    assert(parseTimeNs("2016-08-28 21:24") == base)
    // slash layouts, year-first and US-order
    assert(parseTimeNs("2016/08/28 21:24") == base)
    assert(parseTimeNs("2016/08/28 21:24:00") == base)
    assert(parseTimeNs("08/28/2016 21:24") == base)
    assert(parseTimeNs("08/28/2016 21:24:00") == base)
    val day = parseTimeNs("2016-08-28")
    assert(parseTimeNs("2016/08/28") == day)
    assert(parseTimeNs("08/28/2016") == day)
    assert(parseTimeNs("08/28/16") == day)
    // fractional seconds and explicit offsets still parse
    assert(parseTimeNs("2016-08-28T21:24:00.25Z") == base + 250000000L)
    assert(parseTimeNs("2016-08-28T23:24:00+02:00") == base)
    intercept[IllegalArgumentException](parseTimeNs("not-a-time"))
  }

  test("MM/dd/yy resolves two-digit years on Go's 1969/2068 window") {
    import TickQuery.parseTimeNs
    // Go's time package (behind timelib's layouts) maps yy >= 69 to
    // 19xx and yy < 69 to 20xx; Java's plain `yy` would base at 2000
    assert(parseTimeNs("01/01/69") == parseTimeNs("1969-01-01"))
    assert(parseTimeNs("12/31/68") == parseTimeNs("2068-12-31"))
    assert(parseTimeNs("12/31/99") == parseTimeNs("1999-12-31"))
    assert(parseTimeNs("08/28/16") == parseTimeNs("2016-08-28"))
  }

  test("ingest counts only stored points and validates required fields") {
    TickApi.createDb(spark, store, "db2")
    // the empty-value record is dropped by the store — the returned
    // count must say so, not report a write getPoint can never find
    val n = TickApi.ingest(spark, store, "db2",
      """[{"index": "i1", "time": "2016-08-28T21:24:00Z", "value": {"open": 1.0}},
        | {"index": "i1", "time": "2016-08-28T21:25:00Z", "value": {}},
        | {"index": "i1", "time": "2016-08-28T21:26:00Z"}]""".stripMargin)
    assert(n == 1)
    assert(TickApi.getPoint(spark, store, "db2", "i1", "2016-08-28T21:25:00Z").isEmpty)

    val missingTime = intercept[IllegalArgumentException] {
      TickApi.ingest(spark, store, "db2", """[{"index": "i1", "value": {"a": 1.0}}]""")
    }
    assert(missingTime.getMessage.contains("missing 'time'"))
    intercept[IllegalArgumentException] {
      TickApi.ingest(spark, store, "db2",
        """[{"time": "2016-08-28T21:24:00Z", "value": {"a": 1.0}}]""")
    }
  }
}
