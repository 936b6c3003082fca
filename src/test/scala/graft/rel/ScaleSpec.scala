package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of the big side sits on one key — the classic straggler shape
    val big = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i.toDouble))
      .toDF("k", "v")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum("v")).head()
    val salted = Scale.saltedJoin(big, small, Seq("k"), salts = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain == salted)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = (1 to 5000).map(i => (i.toLong % 3, i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum"), count("v").as("count"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val salted = Scale.saltedSumCount(df, "k", col("v"), salts = 16)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(direct.map(t => (t._1, t._3)).toSeq == salted.map(t => (t._1, t._3)).toSeq)
    direct.zip(salted).foreach { case (d, s) =>
      assert(math.abs(d._2 - s._2) < 1e-6) // fp sums: order differs by design
    }
  }

  test("salted join spreads byte-identical hot-key rows and allows map columns") {
    // all big rows identical: a whole-row-hash salt would collapse them
    // onto one salt (the straggler salting exists to break up); the
    // map column would make a hash-based salt throw outright
    val big = Seq.fill(1000)((0L, Map("f" -> 1.0))).toDF("k", "vals")
    val small = Seq((0L, "hot")).toDF("k", "name")
    val salted = Scale.saltedJoin(big, small, Seq("k"), salts = 8)
    assert(salted.count() == 1000)
    // observe the spread through the same salt expression the join uses:
    // identical rows must land on >1 salt
    val spread = big
      .withColumn("s", pmod(monotonically_increasing_id(), lit(8L)))
      .select("s").distinct().count()
    assert(spread > 1, "identical rows must scatter across salts")
  }

  test("salted join rejects join types that would duplicate small-side rows") {
    val big = Seq((0L, 1.0)).toDF("k", "v")
    val small = Seq((0L, "a")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(big, small, Seq("k"), salts = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(big, small, Seq("k"), salts = 4, joinType = "full_outer")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf, set in SparkSpecBase; also clear
    // stale table locations a previous JVM's in-memory catalog left
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = new org.apache.hadoop.fs.Path(s"${sys.props("java.io.tmpdir")}/graft_warehouse")
    val whFs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("b_orders", "b_lineitem").foreach { t =>
      whFs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
    }
    graft.Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.Tables.lineitem(spark, sf0001)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem").hint("merge"), Seq("o_orderkey"))
      .select("o_orderkey", "o_totalprice", "l_quantity")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed co-located join must not shuffle:\n$plan")
    assert(joined.count() == graft.Tables.lineitem(spark, sf0001).count())
  }

  test("z-order bounds BOTH dimension spans; single-dim sorts leave one unbounded") {
    // the pruning claim behind layout_zorder: split the table into 64
    // equal chunks under each layout and measure each chunk's
    // normalized (a, b) min/max spans — the chunk-level stand-in for a
    // file's row-group stats. A z-sorted layout keeps both spans
    // bounded (measured ~0.50 + ~0.08), so predicates on EITHER
    // dimension skip most chunks; sorting by one dimension leaves the
    // other near 1.0 (no skipping). All inputs deterministic.
    val z = EventQueries.defs("layout_zorder").build(spark, sf001)
    val dims = graft.Tables.events(spark, sf001)
      .select(col("event_id"),
        col("user_id").bitwiseAND(1023).as("a"),
        expr("(unix_micros(ts) div 3600000000) & 1023").as("b"))
    // global extents (b is an hour ring offset that doesn't start at 0)
    val (aMax, bMax) = {
      val r = dims.agg(max(col("a")) - min(col("a")) + 1,
        max(col("b")) - min(col("b")) + 1).head()
      (r.getLong(0), r.getLong(1))
    }
    def spanSums(ordered: org.apache.spark.sql.DataFrame, by: String): (Double, Double) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(by))
      val r = ordered.withColumn("chunk", ntile(64).over(w))
        .groupBy("chunk")
        .agg((max(col("a")) - min(col("a")) + 1).as("sa"),
          (max(col("b")) - min(col("b")) + 1).as("sb"))
        .agg(avg(col("sa")), avg(col("sb"))).head()
      (r.getDouble(0) / aMax, r.getDouble(1) / bMax)
    }
    val (za, zb) = spanSums(z.join(dims, "event_id"), "z")
    val (na, nb) = spanSums(dims, "event_id") // arrival ~ time order
    val (ua, ub) = spanSums(dims, "a")        // user-sorted
    assert(za < 0.7 && zb < 0.2, s"z-order spans too wide: a=$za b=$zb (measured 0.50/0.08)")
    assert(na > 0.9, s"arrival order unexpectedly localized users: $na")
    assert(ub > 0.9, s"user sort unexpectedly localized time: $ub")
    // z beats both single-dim layouts on the combined span
    assert(za + zb < math.min(na + nb, ua + ub),
      s"z-order combined span ${za + zb} not below single-dim layouts (${na + nb}, ${ua + ub})")
  }

  test("approx percentiles land within 1% rank error of exact") {
    val exact = RelQueries.defs("agg_percentiles").build(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = RelQueries.defs("agg_approx_percentile").build(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val li = graft.Tables.lineitem(spark, sf001)
    exact.foreach { case (flag, (p50, p90)) =>
      val (a50, a90) = approx(flag)
      val vals = li.where(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      def rankOf(v: Double): Double =
        vals.count(_ <= v).toDouble / vals.length
      // accuracy=10000 bounds rank error at 1/10000; allow 1% slack for
      // the interpolation-vs-pick difference between the two definitions
      assert(math.abs(rankOf(a50) - rankOf(p50)) <= 0.01, s"$flag p50: $a50 vs $p50")
      assert(math.abs(rankOf(a90) - rankOf(p90)) <= 0.01, s"$flag p90: $a90 vs $p90")
    }
  }
}
