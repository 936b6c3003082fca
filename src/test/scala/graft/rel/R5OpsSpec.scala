package graft.rel

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Invariant pins for the round-5 operator wave (all hash-checked
  * against the DuckDB oracle in the verify gate; these guard the
  * semantics a refactor could break in both engines at once).
  */
class R5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("graph_pagerank matches a sequential fixed-point reference") {
    // sequential re-implementation of the exact integer recurrence over
    // the same sf0.001 graph — any divergence means the distributed
    // join/agg loop reordered something it must not
    val edges = graft.Tables.orders(spark, sf0001)
      .join(graft.Tables.lineitem(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = edges ++ edges.map { case (u, v) => (v, u) }
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var r = deg.keys.map(_ -> 1000000000000L).toMap
    (1 to 10).foreach { _ =>
      val in = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = in.map { case (n, s) => n -> (150000000000L + 85 * s / 100) }
    }
    val expected = r.toSeq.sortBy { case (n, rk) => (-rk, n) }.take(20)
    val got = SparkEntry.queries("graph_pagerank")(spark, sf0001)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == expected, s"distributed/sequential PageRank diverge:\n$got\n$expected")
  }

  test("pagerank mass is conserved up to integer-division truncation") {
    val n = SparkEntry.queries("graph_pagerank")(spark, sf001)
    // top-20 ranks all exceed the uniform start (they're hubs) and
    // carry the damping floor
    val ranks = n.collect().map(_.getLong(1))
    assert(ranks.forall(_ > 1000000000000L), "top-20 must beat the uniform rank")
    assert(ranks.sorted.reverse.toSeq == ranks.toSeq, "ordered by rank desc")
  }

  test("skyline_pareto equals the brute-force frontier at sf0.001") {
    val pts = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice*100) AS BIGINT)"),
        col("o_orderdate").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate.toEpochDay))
    val frontier = pts.filter { case (_, p, d) =>
      !pts.exists { case (_, p2, d2) => p2 < p && d2 > d }
    }.map(_._1).toSet
    val got = SparkEntry.queries("skyline_pareto")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(got == frontier, s"skyline mismatch: got $got expected $frontier")
  }

  test("skyline survivors are mutually non-dominated") {
    val rows = SparkEntry.queries("skyline_pareto")(spark, sf001)
      .collect().map(r => (r.getLong(1), r.getDate(2).toLocalDate.toEpochDay))
    rows.foreach { case (p, d) =>
      assert(!rows.exists { case (p2, d2) => p2 < p && d2 > d },
        s"($p, $d) is dominated inside the frontier")
    }
  }

  test("anomaly_mad flags exactly the > 3-sigma-equivalent deviations") {
    val out = SparkEntry.queries("anomaly_mad")(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (vc, med, mad) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(vc - med) > 4.4478 * mad, s"non-outlier row leaked: $r")
    }
  }

  test("ln micro-nat grid is far from rounding boundaries on the JVM") {
    // the text_entropy contract: round(ln(c)*1e6) must be stable under
    // 1-ulp libm differences. Verify the JVM's ln keeps every count
    // c <= 100k at least 1e-6 from a .5 boundary (cross-libm noise is
    // ~4e-10 at this magnitude).
    val worst = (1 to 100000).map { c =>
      val x = math.log(c.toDouble) * 1e6
      math.abs(x - math.floor(x) - 0.5)
    }.min
    assert(worst > 1e-6, s"ln grid boundary distance too small: $worst")
  }

  test("text_entropy matches a direct per-doc recomputation") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("text_entropy")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def lnInt(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    docs.foreach { case (id, text) =>
      val counts = text.trim.toLowerCase.split("\\s+").groupBy(identity)
        .values.map(_.length.toLong)
      val n = counts.sum
      val expected = lnInt(n) - counts.map(c => c * lnInt(c)).sum / n
      assert(got(id) == expected, s"doc $id entropy ${got(id)} != $expected")
    }
  }

  test("pack_sequences bins are contiguous cuts of the source stream") {
    val rows = SparkEntry.queries("pack_sequences")(spark, sf001)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._2)
      var cum = 0L
      ordered.foreach { case (_, _, nChars, bin, off) =>
        assert(bin == cum / 4096, "bin must be the window of the first char")
        assert(off == cum % 4096 && off >= 0 && off < 4096, "offset within window")
        cum += nChars
      }
    }
  }

  test("sample_temperature flattens the domain distribution") {
    val raw = graft.Tables.documents(spark, sf001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val take = SparkEntry.queries("sample_temperature")(spark, sf001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = raw.values.sum.toDouble
    val sampled = take.values.sum.toDouble
    // alpha=0.5 pulls the head domain's share toward uniform
    val headLang = raw.maxBy(_._2)._1
    assert(take(headLang) / sampled < raw(headLang) / total,
      "head domain share must shrink under temperature sampling")
    take.foreach { case (l, t) => assert(t <= raw(l), s"$l oversampled") }
    // draws are deterministic
    val again = SparkEntry.queries("sample_temperature")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    val first = SparkEntry.queries("sample_temperature")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    assert(again == first, "temperature sample must be reproducible")
  }

  test("text_bm25 returns only term-bearing docs in descending score order") {
    val out = SparkEntry.queries("text_bm25")(spark, sf001).collect()
    assert(out.length == 20)
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "scores must be descending")
    assert(scores.forall(_ > 0.0), "BM25 of a matched doc is positive")
    val ids = out.map(_.getLong(0)).toSet
    val texts = graft.Tables.documents(spark, sf001)
      .where(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase).toMap
    ids.foreach { id =>
      assert(Seq("batch", "index", "shuffle").exists(t =>
        texts(id).split("\\s+").contains(t)), s"doc $id bears no query term")
    }
  }

  test("profile_columns matches direct counts") {
    val out = SparkEntry.queries("profile_columns")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orders = graft.Tables.orders(spark, sf001)
    val n = orders.count()
    assert(out("o_orderkey") == ((0L, n)), "orderkey is a unique non-null key")
    val distinctStatus = orders.select("o_orderstatus").distinct().count()
    assert(out("o_orderstatus")._2 == distinctStatus)
  }

  test("vec_centroids matches the per-label float mean within fixed-point grid") {
    val emb = graft.Tables.embeddings(spark, sf001)
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val byLabel = emb.groupBy(_._1)
    val got = SparkEntry.queries("vec_centroids")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    byLabel.foreach { case (l, vs) =>
      (0 until 64).foreach { d =>
        val mean = vs.map(_._2(d).toDouble).sum / vs.length
        val gotMean = got((l.toLong, d.toLong)).toDouble / 1048576.0
        // integer div truncation + quantization: within 2^-20 + ulp slack
        assert(math.abs(gotMean - mean) < 2.0 / 1048576.0,
          s"centroid($l, $d): $gotMean vs $mean")
      }
    }
  }

  test("vec_random_projection roughly preserves relative distances (JL)") {
    val rows = SparkEntry.queries("vec_random_projection")(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getDouble).toArray).toMap
    val emb = graft.Tables.embeddings(spark, sf001)
      .where(col("vec_id") < 40).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // E[proj dist^2] = orig dist^2 for +-1 sign projections scaled by
    // 1/sqrt(k); unscaled, ratio concentrates around k=8. Median over
    // pairs must land in a generous band around 8.
    val ratios = (for {
      i <- 0L until 20L; j <- (i + 1) until 40L
    } yield d2(rows(i), rows(j)) / d2(emb(i), emb(j))).sorted
    val median = ratios(ratios.length / 2)
    assert(median > 2.0 && median < 32.0,
      s"JL distance-ratio median $median outside the k=8 band")
  }

  test("agg_winsorize means sit inside the clamp band") {
    val v = graft.Tables.lineitem(spark, sf001).select(
      col("l_returnflag").as("g"),
      expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("vc"))
    val p = v.groupBy("g").agg(
      expr("percentile(vc, 0.05)").as("p05"),
      expr("percentile(vc, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    SparkEntry.queries("agg_winsorize")(spark, sf001).collect().foreach { r =>
      val (g, n, mean, clamped) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val (p05, p95) = p(g)
      assert(mean >= p05 && mean <= p95, s"$g winsorized mean outside [$p05,$p95]")
      // by construction at most ~10% of rows sit outside [p05, p95]
      assert(clamped.toDouble / n <= 0.11, s"$g clamps ${clamped}/$n rows")
    }
  }

  test("streaming_session_agg equals the batch sessionizer") {
    val stream = SparkEntry.queries("streaming_session_agg")(spark, sf0001)
    val batch = graft.streaming.Sessionize.batch(
      graft.Tables.events(spark, sf0001), 1800000000L)
    assert(stream.count() == batch.count(),
      "session_window must produce exactly the batch islands")
    // event mass is conserved: every event lands in exactly one session
    val nEvents = graft.Tables.events(spark, sf0001).count()
    val inSessions = stream.agg(sum("n_events")).head().getLong(0)
    assert(inSessions == nEvents, s"$inSessions events in sessions of $nEvents")
  }

  test("join_skew_salted is salt-invariant (equals the plain join)") {
    val plain = {
      val weights = Seq(("click", 1L), ("view", 2L), ("purchase", 10L),
        ("signup", 5L), ("error", 0L)).toDF("event_type", "weight")
      graft.Tables.events(spark, sf001)
        .select(col("event_type"), expr("CAST(round(value*100) AS BIGINT)").as("vc"))
        .join(weights, "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("weight") * col("vc")).as("score_c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    val salted = SparkEntry.queries("join_skew_salted")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain, "salting must never change the join result")
  }

  test("agg_mode picks the maximal frequency with smallest-value ties") {
    val freq = graft.Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag").as("g"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("q"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    SparkEntry.queries("agg_mode")(spark, sf001).collect().foreach { r =>
      val (g, q, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      val grp = freq.filter(_._1 == g)
      assert(grp.forall(_._3 <= n), s"$g: mode freq $n not maximal")
      assert(grp.filter(_._3 == n).map(_._2).min == q, s"$g: tie not broken to min value")
    }
  }

  test("downsample_lttb keeps per-bucket area-maximal points") {
    val rows = SparkEntry.queries("downsample_lttb")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 5 series x <= 50 buckets, one point per occupied bucket
    assert(rows.groupBy(r => (r._1, r._2)).forall(_._2.length == 1))
    assert(rows.groupBy(_._1).forall(_._2.length <= 50))
    // recompute one series' interior selections directly
    val g0 = "click"
    val pts = graft.Tables.events(spark, sf0001)
      .where(col("event_type") === g0)
      .select(unix_micros(col("ts")).as("xus"),
        expr("CAST(round(value*100) AS BIGINT)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val t0 = pts.map(_._1).min; val t1 = pts.map(_._1).max
    val width = (t1 - t0 + 50) / 50
    val byB = pts.groupBy(p => (p._1 - t0) / width)
    val means = byB.map { case (b, ps) =>
      b -> (ps.map(p => (p._1 - t0) / 1000).sum / ps.length, ps.map(_._2).sum / ps.length)
    }
    val occupied = byB.keys.toSeq.sorted
    occupied.sliding(3).foreach {
      case Seq(pb, b, nb) =>
        val (pmx, pmy) = means(pb); val (nmx, nmy) = means(nb)
        val best = byB(b).map { case (xus, y) =>
          val xm = (xus - t0) / 1000
          (-math.abs((pmx - nmx) * (y - pmy) - (pmx - xm) * (nmy - pmy)), xus, y)
        }.min
        val got = rows.find(r => r._1 == g0 && r._2 == b).get
        assert((got._3, got._4) == ((best._2, best._3)),
          s"bucket $b: got (${got._3},${got._4}) expected (${best._2},${best._3})")
      case _ =>
    }
  }

  test("vec_kmeans_assign picks the argmin centroid (sequential recompute)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    // SQL round() is half-AWAY-FROM-ZERO on both engines; Scala
    // math.round is half-toward-+inf — they differ on negative .5s
    def q(v: Float): Long = {
      val x = v.toDouble * 1048576
      if (x >= 0) math.round(x) else -math.round(-x)
    }
    val cent = emb.groupBy(_._2).map { case (l, vs) =>
      l.toLong -> Array.tabulate(64)(d => vs.map(t => q(t._3(d))).sum / vs.length)
    }
    val expected = emb.map { case (id, _, v) =>
      val best = cent.toSeq.map { case (l, m) =>
        val d2 = (0 until 64).map { d => val x = q(v(d)) - m(d); x * x }.sum
        (d2, l)
      }.min
      id -> ((best._2, best._1))
    }.toMap
    SparkEntry.queries("vec_kmeans_assign")(spark, sf0001).collect().foreach { r =>
      val (id, asn, d2) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(expected(id) == ((asn, d2)), s"vec $id: ($asn,$d2) != ${expected(id)}")
    }
  }

  test("events_seasonality indices weight-average to exactly 1 per type") {
    val rows = SparkEntry.queries("events_seasonality")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (t, g) =>
      val total = g.map(_._2).sum.toDouble
      val wavg = g.map { case (_, n, m, _) => n * m }.sum / total
      val wavgIdx = g.map { case (_, n, _, i) => n * i }.sum / total / 1.0
      // weighted mean of dow means == overall mean => weighted idx ~ 1
      assert(math.abs(wavgIdx - 1.0) < 1e-9, s"$t weighted index $wavgIdx != 1")
      assert(g.forall(_._4 > 0), s"$t has a nonpositive seasonal index")
      assert(wavg > 0)
    }
  }

  test("window_percent_cume stays in [0,1] with exact rank arithmetic") {
    val rows = SparkEntry.queries("window_percent_cume")(spark, sf001).collect()
    rows.foreach { r =>
      val (pr, cd) = (r.getDouble(3), r.getDouble(4))
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0, s"out of range: $r")
    }
  }
}
