package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant pins for the round-6 engine changes. */
class R6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("PageRank exits early at the exact integer fixed point") {
    // a 2-regular graph (6-cycle): uniform rank IS the fixed point in
    // exact integer arithmetic (U div 2 summed over 2 in-edges gives U
    // back; 150e9 + 85*U div 100 = U), so the very first convergence
    // probe must stop the loop — far before the iteration cap
    val n = 6
    val fwd = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val und = (fwd ++ fwd.map(_.swap)).toDF("u", "v")
    val (pr, it) = PageRank.run(und, maxIter = 50, checkEvery = 1)
    assert(it < 50, s"must exit before the cap, ran $it")
    val ranks = pr.collect().map(r => r.getLong(1)).toSet
    assert(ranks == Set(1000000000000L),
      s"cycle fixed point is the uniform unit rank, got $ranks")
  }

  test("a period-2 integer orbit never triggers a false early exit") {
    // star graph (hub 0 <-> leaves 1..4): under floor arithmetic the
    // ranks settle into a PERIOD-2 cycle (hub and leaves alternate),
    // never an exact fixed point — precisely the case where comparing
    // r(it) against r(it - checkEvery) would falsely "converge". The
    // adjacent-step probe must keep iterating to the cap, and the
    // capped result must match the sequential integer recurrence.
    val fwd = (1L to 4L).map(l => (0L, l))
    val und = (fwd ++ fwd.map(_.swap)).toDF("u", "v")
    val (pr, it) = PageRank.run(und, maxIter = 20, checkEvery = 2)
    assert(it == 20, s"an orbiting graph must run the full cap, stopped at $it")

    val undSeq = fwd ++ fwd.map(_.swap)
    val deg = undSeq.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var r = deg.keys.map(_ -> 1000000000000L).toMap
    (1 to 20).foreach { _ =>
      val in = undSeq.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = in.map { case (n, s) => n -> (150000000000L + 85 * s / 100) }
    }
    val got = pr.collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got == r, s"capped run must equal the sequential recurrence: $got vs $r")
  }

  test("approximate profile tracks the exact profile within the HLL error bound") {
    val approx = graft.SparkEntry.queries("profile_columns_approx")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.SparkEntry.queries("profile_columns")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nulls, dist)) =>
      val (aNulls, aDist) = approx(c)
      assert(aNulls == nulls, s"$c null count is exact arithmetic, must match")
      // rsd 0.02 requested; allow 3 sigma
      assert(math.abs(aDist - dist) <= math.max(3, 0.06 * dist),
        s"$c approx distinct $aDist vs exact $dist beyond 6%")
    }
  }
}
