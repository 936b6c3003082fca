package graft.rel

import graft.SparkSpec

/** Invariant pins for the feature-engineering wave (feat_target_encode,
  * feat_minmax_scale, feat_quantile_bin, stat_anova). Hash-correctness
  * is the driver's DuckDB gate; these pin the mathematical contracts
  * the hashes can't express: leakage-freedom, range bounds, frequency
  * balance, and a sequential recomputation of F.
  */
class FeatureSpec extends SparkSpec {

  test("target encode is leakage-free: removing one row moves the encoding") {
    val rows = graft.SparkEntry.queries("feat_target_encode")(spark, sf0001)
      .collect()
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment",
        "CAST(round(c_acctbal*100) AS BIGINT) AS y").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val bySeg = cust.values.groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    rows.foreach { r =>
      val (key, seg) = (r.getLong(0), r.getString(1))
      val (n, s) = bySeg(seg)
      val y = cust(key)._2
      if (n == 1) assert(r.isNullAt(2), "singleton categories must encode NULL")
      else {
        // exact LOO identity, truncating division
        assert(r.getLong(2) == (s - y) / (n - 1),
          s"LOO mean mismatch for customer $key")
        // leakage check: the encoding never equals the plain group mean
        // when the row's own value is off-mean (s - y*n != 0 mod ...)
        if (s - y * n != 0)
          assert(r.getLong(2) * (n - 1) != s - s / n, "suspiciously plain mean")
      }
    }
  }

  test("min-max scaling lands exactly on [0, 1e6] at each nation's extremes") {
    val rows = graft.SparkEntry.queries("feat_minmax_scale")(spark, sf0001)
      .collect()
    val byNat = rows.filterNot(_.isNullAt(2))
      .groupBy(_.getAs[Number](1).longValue)
    assert(byNat.nonEmpty, "expected at least one non-degenerate nation")
    byNat.foreach { case (nat, rs) =>
      val vals = rs.map(_.getLong(2))
      assert(vals.forall(v => v >= 0 && v <= 1000000L),
        s"nation $nat scaled outside [0, 1e6]")
      assert(vals.min == 0L, s"nation $nat min must scale to exactly 0")
      assert(vals.max == 1000000L, s"nation $nat max must scale to exactly 1e6")
    }
  }

  test("decile binning: full spine, conserved counts, ordered disjoint ranges") {
    val rows = graft.SparkEntry.queries("feat_quantile_bin")(spark, sf001)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L),
      "all ten deciles must report, in order")
    val nOrders = spark.read.parquet(s"$sf001/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nOrders,
      "bin counts must partition the order count")
    // ranges strictly increase and never overlap: hi(b) < lo(b+1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2),
        s"bins ${a.getLong(0)} and ${b.getLong(0)} overlap")
    }
    // equal frequency up to tie runs: prices are ~all-distinct in the
    // synthetic data, so each decile is within 1% of N/10
    val target = nOrders / 10.0
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - target) <= target * 0.01 + 1,
        s"decile ${r.getLong(0)} count ${r.getLong(1)} far from $target")
    }
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("PSI matches a sequential recomputation at sf0.001") {
    val rows = graft.SparkEntry.queries("feat_drift_psi")(spark, sf0001)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(round(o_totalprice*100) AS BIGINT) AS v",
        "CAST(o_orderdate AS DATE) < DATE '1998-07-01' AS is_a").collect()
    val a = orders.filter(_.getBoolean(1)).map(_.getLong(0)).sorted
    val b = orders.filterNot(_.getBoolean(1)).map(_.getLong(0))
    assert(rows.map(_.getLong(1)).sum == a.length, "c_a must partition |A|")
    assert(rows.map(_.getLong(2)).sum == b.length,
      "edge bins are catch-alls: c_b must partition |B|")
    // sequential: decile edges from A's distinct-value cum counts
    val dv = a.groupBy(identity).toSeq.sortBy(_._1).map { case (v, g) => (v, g.length.toLong) }
    val n = a.length.toLong
    var cum = 0L
    val hiByBin = scala.collection.mutable.Map[Long, Long]()
    val caByBin = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    dv.foreach { case (v, c) =>
      cum += c
      val bin = (10 * cum + n - 1) / n
      hiByBin(bin) = v
      caByBin(bin) += c
    }
    rows.foreach { r =>
      val bin = r.getLong(0)
      assert(r.getLong(1) == caByBin(bin), s"c_a bin $bin")
      val lo = if (bin == 1) None else Some(hiByBin(bin - 1))
      val hi = if (bin == 10) None else Some(hiByBin(bin))
      val cb = b.count(v => lo.forall(v > _) && hi.forall(v <= _)).toLong
      assert(r.getLong(2) == cb, s"c_b bin $bin")
      if (cb == 0) assert(r.isNullAt(3))
      else {
        val term = math.round((cb.toDouble / b.length - caByBin(bin).toDouble / n)
          * round9(math.log(cb.toDouble * n / (caByBin(bin).toDouble * b.length)))
          * 1000000000L)
        assert(r.getLong(3) == term, s"term bin $bin")
      }
    }
  }

  test("WoE/IV: every IV term is non-negative and matches a recomputation") {
    val rows = graft.SparkEntry.queries("feat_woe_iv")(spark, sf0001).collect()
    assert(rows.length == 5, "five order priorities")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderpriority AS cat", "o_totalprice > 200000 AS bad")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val tb = orders.count(_._2).toLong
    val tg = orders.length - tb
    rows.foreach { r =>
      val (cat, ng, nb) = (r.getString(0), r.getLong(1), r.getLong(2))
      val g = orders.filter(_._1 == cat)
      assert(nb == g.count(_._2) && ng == g.count(!_._2))
      if (ng == 0 || nb == 0) assert(r.isNullAt(3) && r.isNullAt(4))
      else {
        val woe = math.round(round9(
          math.log(nb.toDouble * tg / (ng.toDouble * tb))) * 1000000000L)
        assert(r.getLong(3) == woe, s"woe($cat)")
        val ivt = math.round((nb.toDouble / tb - ng.toDouble / tg)
          * round9(math.log(nb.toDouble * tg / (ng.toDouble * tb)))
          * 1000000000L)
        assert(r.getLong(4) == ivt, s"iv($cat)")
        // (p_b - p_g) and ln(p_b/p_g) always share a sign
        assert(r.getLong(4) >= 0, s"IV term must be non-negative ($cat)")
      }
    }
  }

  test("ANOVA F matches a sequential recomputation at sf0.001") {
    val r = graft.SparkEntry.queries("stat_anova")(spark, sf0001).collect().head
    val ys = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("c_mktsegment", "CAST(round(c_acctbal) AS BIGINT) AS y")
      .collect().map(row => (row.getString(0), row.getLong(1)))
    val groups = ys.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = groups.size.toLong
    val n = ys.length.toLong
    val st = ys.map(_._2).sum
    val qt = ys.map(v => v._2 * v._2).sum
    val tb = groups.map(g => g.sum * g.sum / g.size).sum
    val ssbQ = tb - st * st / n
    val sswQ = qt - tb
    assert(r.getLong(0) == k && r.getLong(1) == n)
    assert(r.getLong(2) == ssbQ && r.getLong(3) == sswQ)
    val f = math.round(1000000.0 * ssbQ * (n - k) / (sswQ * (k - 1).toDouble))
    assert(r.getLong(4) == f, "micro-scaled F statistic diverged")
    assert(r.getLong(4) > 0, "balanced synthetic segments still separate means")
  }
}
