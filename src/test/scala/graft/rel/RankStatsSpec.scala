package graft.rel

import graft.SparkSpec

/** Contract edges of the histogram-refinement percentile helper that
  * the oracle queries don't reach: NULL group keys (quantile_cont
  * GROUP BY emits a row for them) and integral spans that collapse
  * under the double cast (the degenerate-bucket guard must agree with
  * the bucket arithmetic's casts).
  */
class RankStatsSpec extends SparkSpec {

  test("a NULL group key gets its own percentile row") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), 1.0), (Option("a"), 3.0),
      (Option.empty[String], 10.0), (Option.empty[String], 20.0),
      (Option.empty[String], 30.0)).toDF("g", "v")
    val got = RankStats.percentiles(df, "g", "v", Seq((0.5, "p50")))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(got.size == 2, s"expected the NULL group to survive: $got")
    assert(got(Option("a")) == 2.0, got.toString)
    assert(got(None) == 20.0, got.toString)
  }

  test("BIGINTs that collapse under the double cast hit the degenerate guard") {
    import spark.implicits._
    // 2^53 and 2^53 + 1: distinct longs, identical as doubles — the
    // old native-type guard missed this and the bucket id went NaN
    val df = Seq(("a", 9007199254740992L), ("a", 9007199254740993L)).toDF("g", "v")
    val got = RankStats.percentiles(df, "g", "v", Seq((0.5, "p50"))).collect()
    assert(got.length == 1, got.mkString(","))
    assert(!got.head.getDouble(1).isNaN, s"NaN percentile: ${got.head}")
    assert(got.head.getDouble(1) == 9007199254740992.0, got.head.toString)
  }
}
