package graft.rel

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.functions.CountMin

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("count-min never undercounts and respects the epsilon*N bound") {
    val keys = graft.Tables.lineitem(spark, sf001).select(col("l_partkey").as("k"))
    val n = keys.count()
    val sketch = keys.agg(CountMin.sketchCol(col("k"))).head().getSeq[Long](0).toArray
    val exact = keys.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    exact.foreach { case (k, c) =>
      val est = CountMin.estimate(sketch, k)
      assert(est >= c, s"key $k undercounted: $est < $c")
      // standard CM bound: overcount <= e*N/width w.h.p. per row,
      // compounded over depth 4 — use the single-row bound as a
      // generous deterministic ceiling for this fixed dataset
      assert(est - c <= math.ceil(math.E * n / CountMin.Width).toLong,
        s"key $k overcount ${est - c} beyond eN/w")
    }
  }

  test("the sketch is partition-order invariant") {
    val keys = graft.Tables.lineitem(spark, sf001).select(col("l_partkey").as("k"))
    val a = keys.repartition(3).agg(CountMin.sketchCol(col("k")))
      .head().getSeq[Long](0)
    val b = keys.repartition(17, col("k")).agg(CountMin.sketchCol(col("k")))
      .head().getSeq[Long](0)
    val c = keys.coalesce(1).agg(CountMin.sketchCol(col("k")))
      .head().getSeq[Long](0)
    assert(a == b && b == c,
      "counter sums must commute across any partitioning (3-way, keyed 17-way, single)")
  }

  test("sketch_heavy_hitters reports the exact top keys with sound estimates") {
    val rows = SparkEntry.queries("sketch_heavy_hitters")(spark, sf001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"estimate below exact for key ${r.getLong(0)}")
    }
  }

  test("HLL rollup: merged daily sketches equal the direct monthly sketch") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("agg_hll_rollup")(spark, sf001)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, sf001)
    // direct per-month sketches, no daily tier: the merged and direct
    // sketches can sit in different internal representations (sparse
    // vs dense promotion depends on input order), so the pin is
    // estimate-level agreement to sketch accuracy — not bit equality
    // (which holds at sf0.01 but breaks at sf0.1, where the daily
    // union promotes earlier than the direct build)
    val direct = ev
      .groupBy(date_trunc("month", col("ts").cast("date")).cast("date").as("month"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    direct.foreach { case (m, d) =>
      assert(math.abs(rows(m) - d) <= math.max(5.0, 0.02 * d),
        s"month $m: merged ${rows(m)} far from direct $d")
    }
    // and the estimate tracks the exact distinct within 3 sigma
    // (lgConfigK=12 -> sigma ~ 1.04/sqrt(2^12) ~ 1.6%)
    val exact = ev
      .groupBy(date_trunc("month", col("ts").cast("date")).cast("date").as("month"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    exact.foreach { case (m, n) =>
      assert(math.abs(rows(m) - n) <= math.max(5.0, 3 * 0.0163 * n),
        s"month $m: est ${rows(m)} vs exact $n")
    }
  }
}
