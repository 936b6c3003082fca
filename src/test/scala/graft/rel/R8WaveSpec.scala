package graft.rel

import graft.SparkSpec

/** Invariant pins for the round-8 statistics/indicator wave
  * (stat_benford, stat_mannwhitney, stat_theil_sen, tick_bollinger,
  * tick_rsi, q10_join). Hash-correctness is the driver's DuckDB gate;
  * these pin the mathematical invariants the hashes can't express.
  */
class R8WaveSpec extends SparkSpec {

  test("Benford audit: full digit spine, counts conserve, expectations sum to 1") {
    val rows = graft.SparkEntry.queries("stat_benford")(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L),
      "all nine leading digits must report, in order")
    val nOrders = spark.read.parquet(s"$sf001/orders.parquet")
      .where("o_totalprice > 0").count()
    assert(rows.map(_.getLong(1)).sum == nOrders,
      "observed counts must partition the filtered order count")
    // sum log10(1 + 1/d) for d=1..9 telescopes to log10(10) = 1 exactly;
    // after 9dp rounding each term, the nano-scaled sum stays within 5
    // nano of 1e9
    val expSum = rows.map(_.getLong(3)).sum
    assert(math.abs(expSum - 1000000000L) <= 5, s"exp_nano sum was $expSum")
  }

  test("Mann-Whitney: rank-sum identities hold and U is in range") {
    val r = graft.SparkEntry.queries("stat_mannwhitney")(spark, sf001).collect().head
    val (n1, n2, r1x2, u1x2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // R1 + R2 = N(N+1)/2, so 2*R1 is bounded by N(N+1) minus group 2's
    // minimum possible rank sum n2(n2+1)/2
    val nn = n1 + n2
    assert(r1x2 >= n1 * (n1 + 1) && r1x2 <= nn * (nn + 1) - n2 * (n2 + 1))
    assert(u1x2 >= 0 && u1x2 <= 2 * n1 * n2, "0 <= U1 <= n1*n2 (x2 frame)")
  }

  test("Mann-Whitney matches a sequential rank computation at sf0.001") {
    val r = graft.SparkEntry.queries("stat_mannwhitney")(spark, sf0001).collect().head
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .where("event_type in ('click','view')")
      .select("event_type", "value").collect()
      .map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
    val sorted = ev.sortBy(_._2)
    // tie-averaged ranks, sequentially
    val ranks = scala.collection.mutable.Map.empty[Long, Double]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      ranks(sorted(i)._2) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      i = j
    }
    val r1 = ev.filter(_._1 == "click").map(x => ranks(x._2)).sum
    assert(r.getLong(2) == math.round(2 * r1), "2x rank sum must match")
    assert(r.getLong(0) == ev.count(_._1 == "click").toLong)
    assert(r.getLong(1) == ev.count(_._1 == "view").toLong)
  }

  test("Theil-Sen: pair counts are days-choose-2 and the median slope is bracketed") {
    val days = spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("event_type", "CAST(ts AS DATE) AS d",
        "CAST(round(value*100) AS BIGINT) AS vc")
      .groupBy("event_type", "d").count()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = graft.SparkEntry.queries("stat_theil_sen")(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSet == days.keySet)
    rows.foreach { r =>
      val nd = days(r.getString(0))
      assert(r.getLong(1) == nd * (nd - 1) / 2,
        s"${r.getString(0)}: pair space is C(days,2), never rows-squared")
      // a median pairwise slope is bracketed by the extreme pairwise slopes;
      // daily totals at sf0.01 are ~1e5 cents so +/-1e11 micro is generous
      assert(math.abs(r.getDouble(2)) < 1e11)
    }
  }

  test("Bollinger: band geometry and breach flags are mutually consistent") {
    val rows = graft.SparkEntry.queries("tick_bollinger")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, s7, sd, up, lo) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
      assert(sd >= 0, "stddev is a nonnegative integer in the x7 frame")
      assert(up - lo == 4 * sd, "band width is 4 sigma by construction")
      assert(r.getBoolean(7) == (7 * v > up))
      assert(r.getBoolean(8) == (7 * v < lo))
      assert(!(r.getBoolean(7) && r.getBoolean(8)))
    }
  }

  test("RSI stays in [0, 1e6] and is NULL only on flat windows") {
    val rows = graft.SparkEntry.queries("tick_rsi")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sg, sl) = (r.getLong(2), r.getLong(3))
      if (sg + sl == 0) assert(r.isNullAt(4))
      else {
        val ppm = r.getLong(4)
        assert(ppm >= 0 && ppm <= 1000000)
        assert(ppm == sg * 1000000 / (sg + sl))
      }
    }
  }

  test("Q10: top-20 returned-item revenue is sorted and strictly positive") {
    val rows = graft.SparkEntry.queries("q10_join")(spark, sf001).collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getDouble(4))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "revenue must be non-increasing")
    assert(revs.forall(_ > 0))
  }

  test("Cramér's V agrees with stat_chi2 and lands in [0, 1]") {
    val v = graft.SparkEntry.queries("stat_cramers_v")(spark, sf001)
      .collect().head
    val chi = graft.SparkEntry.queries("stat_chi2")(spark, sf001)
      .collect().head
    assert(v.getLong(0) == chi.getLong(0),
      "both queries must report the identical micro-scaled chi2")
    assert(v.getLong(1) == chi.getLong(2), "same N")
    val vm = v.getLong(3)
    assert(vm >= 0 && vm <= 1000000L, s"V=$vm outside [0, 1e6]")
    // V == sqrt(chi2 / (N * dmin)) recomputed
    val expect = math.round(1000000 * math.sqrt(
      chi.getLong(0).toDouble / 1000000.0 / (v.getLong(1) * v.getLong(2))))
    assert(vm == expect)
  }

  test("RRF fusion scores recompute from the two rank columns") {
    val rows = graft.SparkEntry.queries("text_rrf_fusion")(spark, sf001)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val r1 = if (r.isNullAt(1)) 0L else 1000000L / (60 + r.getLong(1))
      val r2 = if (r.isNullAt(2)) 0L else 1000000L / (60 + r.getLong(2))
      assert(!(r.isNullAt(1) && r.isNullAt(2)),
        "a fused doc must appear in at least one ranking")
      assert(r.getLong(3) == r1 + r2, s"rrf mismatch for doc ${r.getLong(0)}")
    }
    val scores = rows.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // a doc ranked top by BOTH lists must outrank a doc on one list
    assert(scores.head >= 2 * 1000000L / (60 + 50),
      "top fused doc should plausibly draw from both rankers")
  }

  test("cohort LTV curves are monotone and conserve purchase revenue") {
    val rows = graft.SparkEntry.queries("events_cohort_ltv")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).forall(_ >= 0), s"negative offset in $c")
      // running sum telescopes: cum(k) == sum of rev(0..k)
      var acc = 0L
      sorted.foreach { r =>
        acc += r.getLong(2)
        assert(r.getLong(3) == acc, s"cum mismatch at $c/${r.getLong(1)}")
      }
    }
    // grand total equals all purchase revenue (every purchaser has a cohort)
    val total = spark.read.parquet(s"$sf001/events.parquet")
      .where("event_type = 'purchase'")
      .selectExpr("CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)")
      .collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == total,
      "cohort triangle must partition total purchase revenue")
  }

  test("Spearman matches a sequential tie-averaged rank recomputation") {
    val r = graft.SparkEntry.queries("stat_spearman")(spark, sf0001)
      .collect().head
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("c_custkey", "CAST(round(c_acctbal*100) AS BIGINT) AS x")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice*100) AS BIGINT) AS v")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sum)
      .toMap
    val pairs = cust.keySet.intersect(spend.keySet).toSeq
      .map(k => (cust(k), spend(k)))
    assert(r.getLong(0) == pairs.length)
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v); val ties = sorted.count(_ == v)
        v -> (2L * below + ties + 1)
      }.toMap
    }
    val rx = ranks2(pairs.map(_._1)); val ry = ranks2(pairs.map(_._2))
    val xs = pairs.map(p => rx(p._1).toDouble)
    val ys = pairs.map(p => ry(p._2).toDouble)
    val n = pairs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val (qx, qy) = (xs.map(v => v * v).sum, ys.map(v => v * v).sum)
    val pxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val rho = 1000000 * (n * pxy - sx * sy) /
      (math.sqrt(n * qx - sx * sx) * math.sqrt(n * qy - sy * sy))
    // the engines sum exact BIGINTs; the sequential recompute uses
    // doubles, so allow 1 micro-unit of fp slack in the check
    assert(math.abs(r.getLong(1) - math.round(rho)) <= 1,
      s"rho ${r.getLong(1)} vs sequential ${math.round(rho)}")
    assert(math.abs(r.getLong(1)) <= 1000000L)
  }

  test("hybrid search fuses BOTH modalities and scores recompute") {
    val rows = graft.SparkEntry.queries("sim_hybrid_search")(spark, sf001)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val r1 = if (r.isNullAt(1)) 0L else 1000000L / (60 + r.getLong(1))
      val r2 = if (r.isNullAt(2)) 0L else 1000000L / (60 + r.getLong(2))
      assert(!(r.isNullAt(1) && r.isNullAt(2)))
      assert(r.getLong(3) == r1 + r2, s"rrf mismatch for doc ${r.getLong(0)}")
    }
    // the semantic list always has 50 entries (cosine ranks everything),
    // so the fused top-10 must contain semantic-ranked docs; and the
    // lexical modality must contribute too, or the fusion is vacuous
    assert(rows.exists(!_.isNullAt(2)), "no semantic contribution")
    assert(rows.exists(!_.isNullAt(1)), "no lexical contribution")
  }

  test("negative sampling: never a positive, 5 per user, run-deterministic") {
    val q = graft.SparkEntry.queries("sample_negatives")
    val rows = q(spark, sf0001).collect()
    val interactions = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/lineitem.parquet"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("o_custkey", "l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(!interactions((r.getLong(0), r.getLong(1))),
        s"sampled a POSITIVE pair ${(r.getLong(0), r.getLong(1))}")
    }
    // sf0.001 has only 10 suppliers, so a user's negative pool can be
    // smaller than 5 (or empty) — each user must get min(5, pool) in
    // consecutive rank order, where pool = catalog minus interactions
    val catalog = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val batch = interactions.map(_._1).toSeq.sorted.take(20)
    val perUser = rows.groupBy(_.getLong(0))
    assert(perUser.keySet.subsetOf(batch.toSet))
    batch.foreach { c =>
      val pool = catalog.size - interactions.count(_._1 == c)
      val got = perUser.get(c).map(_.length).getOrElse(0)
      assert(got == math.min(5, pool), s"user $c: $got of pool $pool")
      perUser.get(c).foreach { rs =>
        assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to got).toSeq,
          s"user $c ranks not consecutive")
      }
    }
    // digest ranking is deterministic: a second run returns the identical set
    val again = q(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("ATR: true range dominates H-L and the 7-day total telescopes") {
    val rows = graft.SparkEntry.queries("tick_atr")(spark, sf0001).collect()
    val bySeries = rows.groupBy(_.getString(0))
    assert(bySeries.size == 5, "all five event-type series")
    bySeries.foreach { case (s, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      sorted.foreach(r => assert(r.getLong(2) >= 0, s"negative TR in $s"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val win = sorted.slice(math.max(0, i - 6), i + 1).map(_.getLong(2)).sum
        assert(r.getLong(3) == win, s"ATR window mismatch $s@$i")
      }
    }
  }
}
