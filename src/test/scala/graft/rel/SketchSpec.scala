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
}
