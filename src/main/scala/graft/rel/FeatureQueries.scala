package graft.rel
import graft.Pinned.PinnedOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators — the tabular-feature half of the
  * training-data story (the text/vec modules cover the corpus half).
  * Reference scope: tickdb has no feature ops; this is extension
  * surface mandated by the builder prompt (LLM-pipeline operators).
  *
  * Shared discipline: every encoder is "one partial-aggregated pass
  * over the fact + one broadcast join back" — the group statistics
  * relations are category-sized (segments, nations, deciles), orders
  * of magnitude below the fact, so no plan here shuffles the fact
  * table at any scale. Arithmetic is exact integer (cents / ppm with
  * truncating `div`, which DuckDB's `//` matches on both signs), so
  * every query is hash-gated, not tolerance-gated.
  */
object FeatureQueries {

  private[graft] val defs: Map[String, QueryDef] = Map(

    // LEAVE-ONE-OUT TARGET ENCODING — the standard high-cardinality
    // categorical encoder for gradient-boosted / linear models: each
    // row gets its category's target mean computed WITHOUT itself,
    // the classic guard against target leakage (a category seen once
    // yields NULL, not its own label). One groupBy collapses the
    // table to |categories| rows; the encode join is a broadcast
    // map-side pass, so the fact never shuffles. (s - y) div (n - 1)
    // keeps the encoding exact integer cents — truncation toward
    // zero matches DuckDB `//` on negative balances too.
    "feat_target_encode" -> QueryDef(
      """WITH y AS (
        |  SELECT c_custkey, c_mktsegment AS seg,
        |         CAST(round(c_acctbal*100) AS BIGINT) AS y
        |  FROM customer),
        |g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(y) AS BIGINT) AS s
        |      FROM y GROUP BY 1)
        |SELECT c_custkey, y.seg,
        |  CASE WHEN n = 1 THEN NULL ELSE (s - y) // (n - 1) END AS enc_cents
        |FROM y JOIN g ON y.seg = g.seg
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal*100) AS BIGINT)").as("y"))
      val g = y.groupBy("seg").agg(count(lit(1)).as("n"), sum("y").as("s"))
      y.join(broadcast(g), "seg")
        .select(col("c_custkey"), col("seg"),
          when(col("n") === 1, lit(null))
            .otherwise(expr("(s - y) div (n - 1)")).as("enc_cents"))
        .orderBy("c_custkey")
    },

    // MIN-MAX SCALING per nation — normalize account balances into
    // [0, 1e6] ppm within each nation, the bounded-range sibling of
    // the z-score (tick_zscore_day). Degenerate groups (mx = mn)
    // yield NULL rather than a divide-by-zero. Same shape: one tiny
    // per-nation extremes aggregate broadcast back over the fact.
    "feat_minmax_scale" -> QueryDef(
      """WITH y AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal*100) AS BIGINT) AS y
        |  FROM customer),
        |g AS (SELECT c_nationkey AS nk, MIN(y) AS mn, MAX(y) AS mx
        |      FROM y GROUP BY 1)
        |SELECT c_custkey, c_nationkey,
        |  CASE WHEN mx = mn THEN NULL
        |       ELSE ((y - mn) * 1000000) // (mx - mn) END AS scaled_ppm
        |FROM y JOIN g ON c_nationkey = nk
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d).select(col("c_custkey"),
        col("c_nationkey"),
        expr("CAST(round(c_acctbal*100) AS BIGINT)").as("y"))
      val g = y.groupBy(col("c_nationkey").as("nk"))
        .agg(min("y").as("mn"), max("y").as("mx"))
      y.join(broadcast(g), col("c_nationkey") === col("nk"))
        .select(col("c_custkey"), col("c_nationkey"),
          when(col("mx") === col("mn"), lit(null))
            .otherwise(expr("((y - mn) * 1000000) div (mx - mn)"))
            .as("scaled_ppm"))
        .orderBy("c_custkey")
    },

    // EQUAL-FREQUENCY (DECILE) BINNING — the discretizer feeding
    // histogram-based learners and monotonic-binning credit models.
    // A distinct value's bin is ceil(10 * cum / N) over the ordered
    // distinct-VALUE axis, so ties land in one bin deterministically
    // and bins are equal-frequency up to tie runs. The global cumsum
    // is the textbook two-phase parallel prefix sum: values
    // range-bucket by a fixed 2^20-cent stride, per-bucket subtotals
    // (a ~60-row relation) cumsum on the driver-sized axis and
    // broadcast back as offsets, and each bucket's local window adds
    // its offset — the ordered window never sees more than one
    // bucket's distinct values in a partition, so the sort that
    // would single-thread a naive cumsum parallelizes. (The oracle
    // states the same semantics with the naive global window —
    // semantics, not plan, is what it pins.)
    "feat_quantile_bin" -> QueryDef(
      """WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v
        |           FROM orders),
        |dv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |cum AS (SELECT v, c,
        |    CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM dv),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM dv)
        |SELECT (10 * cum + n - 1) // n AS bin,
        |  CAST(SUM(c) AS BIGINT) AS n_rows,
        |  MIN(v) AS lo_cents, MAX(v) AS hi_cents
        |FROM cum, t
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val v = Tables.orders(s, d)
        .select(expr("CAST(round(o_totalprice*100) AS BIGINT)").as("v"))
      val dv = v.groupBy("v").agg(count(lit(1)).as("c"))
        .withColumn("bucket", expr("v div 1048576"))
      val off = dv.groupBy("bucket").agg(sum("c").as("bc"))
      val wOff = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = off.select(col("bucket"),
        coalesce(sum("bc").over(wOff), lit(0L)).as("off"))
      val wLoc = Window.partitionBy("bucket").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = dv.join(broadcast(offs), "bucket")
        .withColumn("cum", sum("c").over(wLoc) + col("off"))
      // total from the ~60-row bucket subtotals, not a third dv pass
      val n = off.agg(sum("bc").as("n"))
      cum.crossJoin(broadcast(n))
        .select(expr("(10 * cum + n - 1) div n").as("bin"), col("c"), col("v"))
        .groupBy("bin").agg(sum("c").as("n_rows"),
          min("v").as("lo_cents"), max("v").as("hi_cents"))
        .orderBy("bin")
    },

    // POPULATION STABILITY INDEX — the production drift monitor run
    // before every model refresh: bin the REFERENCE window's price
    // distribution into its own deciles, drop the CURRENT window's
    // values into those frozen bins, and sum (pB - pA) * ln(pB / pA).
    // Decile edges come from the same two-phase prefix-sum as
    // feat_quantile_bin; the current window then bins against the
    // 10-row frozen-interval relation via a broadcast nested-loop
    // join (10 rows x fact — the accepted broadcast-of-aggregate
    // shape), so neither window ever shuffles. Counts stay exact
    // BIGINT; each bin's term closes in ONE fixed double-op sequence
    // (9dp-rounded ln, nano-scaled product), so the statistic is
    // partition-order independent and hash-gated. An empty current
    // bin yields NULL (the epsilon-clip variants are policy, not
    // math; absence is the honest answer).
    "feat_drift_psi" -> QueryDef(
      """WITH pa AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v
        |            FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-07-01'),
        |pb AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v
        |       FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-07-01'),
        |dv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM pa GROUP BY 1),
        |cum AS (SELECT v, c,
        |    CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM dv),
        |na AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM dv),
        |abin AS (SELECT (10 * cum + n - 1) // n AS bin, c, v FROM cum, na),
        |aagg AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS c_a, MAX(v) AS hi
        |         FROM abin GROUP BY 1),
        |iv AS (SELECT bin, c_a,
        |         lag(hi) OVER (ORDER BY bin) AS lo_excl,
        |         CASE WHEN bin = 10 THEN NULL ELSE hi END AS hi_incl
        |       FROM aagg),
        |bagg AS (SELECT iv.bin, CAST(COUNT(pb.v) AS BIGINT) AS c_b
        |         FROM iv LEFT JOIN pb
        |           ON (iv.lo_excl IS NULL OR pb.v > iv.lo_excl)
        |          AND (iv.hi_incl IS NULL OR pb.v <= iv.hi_incl)
        |         GROUP BY 1),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pb)
        |SELECT iv.bin, iv.c_a, bagg.c_b,
        |  CASE WHEN bagg.c_b = 0 THEN NULL
        |       ELSE CAST(round((CAST(bagg.c_b AS DOUBLE) / nb.n
        |           - CAST(iv.c_a AS DOUBLE) / na.n)
        |         * round(ln(CAST(bagg.c_b AS DOUBLE) * na.n
        |             / (CAST(iv.c_a AS DOUBLE) * nb.n)), 9)
        |         * 1000000000) AS BIGINT) END AS term_nano
        |FROM iv JOIN bagg ON iv.bin = bagg.bin, na, nb
        |ORDER BY iv.bin""".stripMargin) { (s, d) =>
      val prices = Tables.orders(s, d).select(
        expr("CAST(round(o_totalprice*100) AS BIGINT)").as("v"),
        (col("o_orderdate").cast("date")
          < lit(java.sql.Date.valueOf("1998-07-01"))).as("is_a"))
      val pa = prices.where(col("is_a")).select("v")
      val pb = prices.where(!col("is_a")).select(col("v").as("bv"))
      val dv = pa.groupBy("v").agg(count(lit(1)).as("c"))
        .withColumn("bucket", expr("v div 1048576"))
      val off = dv.groupBy("bucket").agg(sum("c").as("bc"))
      val wOff = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = off.select(col("bucket"),
        coalesce(sum("bc").over(wOff), lit(0L)).as("off"))
      val wLoc = Window.partitionBy("bucket").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // total from the ~60-row bucket subtotals, not a third dv pass
      val na = off.agg(sum("bc").as("n"))
      val abin = dv.join(broadcast(offs), "bucket")
        .withColumn("cum", sum("c").over(wLoc) + col("off"))
        .crossJoin(broadcast(na))
        .select(expr("(10 * cum + n - 1) div n").as("bin"), col("c"), col("v"))
      val aagg = abin.groupBy("bin")
        .agg(sum("c").as("c_a"), max("v").as("hi"))
      val wBin = Window.orderBy("bin")
      // materialize the 10-row frozen-bin relation: it feeds both the
      // current-window bin join and the final report, and without the
      // cut the whole reference-window pipeline would run twice
      val iv = aagg.select(col("bin"), col("c_a"),
        lag("hi", 1).over(wBin).as("lo_excl"),
        when(col("bin") === 10, lit(null)).otherwise(col("hi")).as("hi_incl"))
        .pinned
      // inner BNLJ with the 10-row interval relation broadcast (a LEFT
      // join could not build its preserved side); bins the current
      // window never hits re-enter as c_b = 0 via the tiny left join
      val matched = pb.join(broadcast(iv),
          (col("lo_excl").isNull || col("bv") > col("lo_excl")) &&
            (col("hi_incl").isNull || col("bv") <= col("hi_incl")))
        .groupBy("bin").agg(count(lit(1)).as("c_b"))
      val bagg = iv.select("bin").join(broadcast(matched), Seq("bin"), "left")
        .select(col("bin"), coalesce(col("c_b"), lit(0L)).as("c_b"))
      val nb = pb.agg(count(lit(1)).as("n").cast("long").as("nb_n"))
      iv.join(bagg, "bin")
        .crossJoin(broadcast(na.select(col("n").as("na_n"))))
        .crossJoin(broadcast(nb))
        .select(col("bin"), col("c_a"), col("c_b"),
          when(col("c_b") === 0, lit(null))
            .otherwise(expr("""CAST(round((CAST(c_b AS DOUBLE) / nb_n
                - CAST(c_a AS DOUBLE) / na_n)
              * round(ln(CAST(c_b AS DOUBLE) * na_n
                  / (CAST(c_a AS DOUBLE) * nb_n)), 9)
              * 1000000000) AS BIGINT)""")).as("term_nano"))
        .orderBy("bin")
    },

    // WEIGHT OF EVIDENCE + INFORMATION VALUE — the credit-scoring
    // categorical encoder (and its feature-selection companion):
    // per category, WoE = ln(event share / non-event share), and the
    // IV term (p_event - p_nonevent) * WoE says how much separating
    // power the category carries. Event = high-value order
    // (> 200k). One partial-aggregated pass collapses the fact to
    // |categories| rows; everything after runs on that tiny
    // relation. Counts exact BIGINT, WoE/IV closed in one fixed
    // double-op sequence each, nano-scaled — hash-gated. A category
    // with an empty class yields NULL (same no-epsilon policy as
    // feat_drift_psi).
    "feat_woe_iv" -> QueryDef(
      """WITH t AS (SELECT o_orderpriority AS cat,
        |             CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END AS bad
        |           FROM orders),
        |g AS (SELECT cat, CAST(SUM(bad) AS BIGINT) AS nb,
        |        CAST(COUNT(*) - SUM(bad) AS BIGINT) AS ng
        |      FROM t GROUP BY 1),
        |m AS (SELECT CAST(SUM(nb) AS BIGINT) AS tb,
        |        CAST(SUM(ng) AS BIGINT) AS tg FROM g)
        |SELECT cat, ng, nb,
        |  CASE WHEN ng = 0 OR nb = 0 THEN NULL
        |       ELSE CAST(round(round(ln(CAST(nb AS DOUBLE) * tg
        |           / (CAST(ng AS DOUBLE) * tb)), 9) * 1000000000) AS BIGINT)
        |  END AS woe_nano,
        |  CASE WHEN ng = 0 OR nb = 0 THEN NULL
        |       ELSE CAST(round((CAST(nb AS DOUBLE) / tb - CAST(ng AS DOUBLE) / tg)
        |         * round(ln(CAST(nb AS DOUBLE) * tg
        |             / (CAST(ng AS DOUBLE) * tb)), 9)
        |         * 1000000000) AS BIGINT)
        |  END AS iv_term_nano
        |FROM g, m ORDER BY cat""".stripMargin) { (s, d) =>
      val t = Tables.orders(s, d).select(col("o_orderpriority").as("cat"),
        when(col("o_totalprice") > 200000, 1).otherwise(0).as("bad"))
      val g = t.groupBy("cat").agg(sum("bad").cast("long").as("nb"),
        (count(lit(1)) - sum("bad")).cast("long").as("ng"))
      val m = g.agg(sum("nb").as("tb"), sum("ng").as("tg"))
      g.crossJoin(broadcast(m))
        .select(col("cat"), col("ng"), col("nb"),
          when(col("ng") === 0 || col("nb") === 0, lit(null))
            .otherwise(expr("""CAST(round(round(ln(CAST(nb AS DOUBLE) * tg
                / (CAST(ng AS DOUBLE) * tb)), 9) * 1000000000) AS BIGINT)"""))
            .as("woe_nano"),
          when(col("ng") === 0 || col("nb") === 0, lit(null))
            .otherwise(expr("""CAST(round((CAST(nb AS DOUBLE) / tb
                - CAST(ng AS DOUBLE) / tg)
              * round(ln(CAST(nb AS DOUBLE) * tg
                  / (CAST(ng AS DOUBLE) * tb)), 9)
              * 1000000000) AS BIGINT)"""))
            .as("iv_term_nano"))
        .orderBy("cat")
    },

    // ONE-WAY ANOVA F — does mean balance differ across market
    // segments? The omnibus member of the hypothesis-test family
    // (chi2 = categorical independence, z = two proportions, U = two
    // ranks, KS = two ECDFs; F = k means). Everything up to the
    // final statistic is exact BIGINT: per-group (n, sum, sum-sq)
    // partials, between-group sum of squares via the computational
    // identity sum(s_g^2/n_g) - S^2/N with per-term truncating
    // division (identical truncation both engines, error < k + 1
    // units against >= 1e10 sums). Balances are rounded to whole
    // units, not cents, so every square stays far from BIGINT range
    // even at 100x the graded scale. ONE double-op sequence closes F
    // in micro-units.
    "stat_anova" -> QueryDef(
      """WITH y AS (
        |  SELECT c_mktsegment AS seg, CAST(round(c_acctbal) AS BIGINT) AS y
        |  FROM customer),
        |g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(y) AS BIGINT) AS s,
        |        CAST(SUM(y*y) AS BIGINT) AS q
        |      FROM y GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n,
        |        CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(q) AS BIGINT) AS qt,
        |        CAST(SUM((s * s) // n) AS BIGINT) AS tb
        |      FROM g),
        |f AS (SELECT k, n, tb - (st * st) // n AS ssb_q, qt - tb AS ssw_q FROM m)
        |SELECT k, n, ssb_q, ssw_q,
        |  CAST(round(1000000.0 * ssb_q * (n - k)
        |    / (ssw_q * CAST(k - 1 AS DOUBLE))) AS BIGINT) AS f_micro
        |FROM f""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d).select(col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal) AS BIGINT)").as("y"))
      val g = y.groupBy("seg").agg(count(lit(1)).as("n"),
        sum("y").as("s"), sum(col("y") * col("y")).as("q"))
      val m = g.agg(count(lit(1)).as("k"), sum("n").as("n"),
        sum("s").as("st"), sum("q").as("qt"),
        sum(expr("(s * s) div n")).as("tb"))
      val f = m.select(col("k"), col("n"),
        expr("tb - (st * st) div n").as("ssb_q"),
        expr("qt - tb").as("ssw_q"))
      f.select(col("k"), col("n"), col("ssb_q"), col("ssw_q"),
        expr("""CAST(round(1000000.0 * ssb_q * (n - k)
          / (ssw_q * CAST(k - 1 AS DOUBLE))) AS BIGINT)""").as("f_micro"))
    },

    // JARQUE-BERA normality test — the moment-based gaussianity check
    // run before every parametric assumption (JB = n/6*(S^2 +
    // (K-3)^2/4) from sample skewness and kurtosis). One aggregate
    // pass collects the four raw power sums EXACTLY — s4 in
    // DECIMAL(38,0), because sum(y^4) clears BIGINT range at sf0.1
    // and beyond — then ONE shared double-op sequence (identical
    // text on both engines, sqrt not pow, so every fp step is
    // IEEE-determined) closes the statistic. Map-side combinable,
    // zero shuffles beyond the final 1-row reduce: the 100 TB plan.
    "stat_jarque_bera" -> QueryDef(
      """WITH y AS (
        |  SELECT CAST(round(c_acctbal) AS BIGINT) AS y FROM customer),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(y) AS BIGINT) AS s1,
        |        CAST(SUM(y*y) AS BIGINT) AS s2,
        |        CAST(SUM(y*y*y) AS BIGINT) AS s3,
        |        CAST(SUM(CAST(y*y*y*y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s4
        |      FROM y),
        |d AS (SELECT n,
        |        CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS a1,
        |        CAST(s2 AS DOUBLE) AS a2, CAST(s3 AS DOUBLE) AS a3,
        |        CAST(s4 AS DOUBLE) AS a4 FROM g),
        |m AS (SELECT n, nd, a1 / nd AS mu, a2, a3, a4 FROM d),
        |c AS (SELECT n, nd,
        |        a2 / nd - mu * mu AS m2,
        |        a3 / nd - 3 * mu * (a2 / nd) + 2 * mu * mu * mu AS m3,
        |        a4 / nd - 4 * mu * (a3 / nd) + 6 * mu * mu * (a2 / nd)
        |          - 3 * mu * mu * mu * mu AS m4
        |      FROM m),
        |sk AS (SELECT n, nd, m3 / (m2 * sqrt(m2)) AS s, m4 / (m2 * m2) AS k
        |       FROM c)
        |SELECT n,
        |  CAST(round(s * 1000000) AS BIGINT) AS skew_micro,
        |  CAST(round(k * 1000000) AS BIGINT) AS kurt_micro,
        |  CAST(round(nd / 6.0 * (s * s + (k - 3.0) * (k - 3.0) / 4.0) * 1000000)
        |    AS BIGINT) AS jb_micro
        |FROM sk""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d)
        .select(expr("CAST(round(c_acctbal) AS BIGINT)").as("y"))
      val g = y.agg(count(lit(1)).as("n"), sum("y").as("s1"),
        sum(expr("y*y")).as("s2"), sum(expr("y*y*y")).as("s3"),
        sum(expr("CAST(y*y*y*y AS DECIMAL(38,0))")).cast("decimal(38,0)").as("s4"))
      // the double-op sequence below is TEXT-IDENTICAL to the oracle
      // CTE chain: same parenthesization => same IEEE result bits
      g.selectExpr("n", "CAST(n AS DOUBLE) AS nd", "CAST(s1 AS DOUBLE) AS a1",
          "CAST(s2 AS DOUBLE) AS a2", "CAST(s3 AS DOUBLE) AS a3",
          "CAST(s4 AS DOUBLE) AS a4")
        .selectExpr("n", "nd", "a1 / nd AS mu", "a2", "a3", "a4")
        .selectExpr("n", "nd",
          "a2 / nd - mu * mu AS m2",
          "a3 / nd - 3 * mu * (a2 / nd) + 2 * mu * mu * mu AS m3",
          """a4 / nd - 4 * mu * (a3 / nd) + 6 * mu * mu * (a2 / nd)
             - 3 * mu * mu * mu * mu AS m4""")
        .selectExpr("n", "nd", "m3 / (m2 * sqrt(m2)) AS s", "m4 / (m2 * m2) AS k")
        .selectExpr("n",
          "CAST(round(s * 1000000) AS BIGINT) AS skew_micro",
          "CAST(round(k * 1000000) AS BIGINT) AS kurt_micro",
          """CAST(round(nd / 6.0 * (s * s + (k - 3.0) * (k - 3.0) / 4.0) * 1000000)
             AS BIGINT) AS jb_micro""")
    },

    // BROWN-FORSYTHE (median-centered Levene) — equal-variance test
    // across segments, the robust gatekeeper before ANOVA trusts its
    // pooled variance. Per-group medians come from the shared
    // histogram-refinement RankStats (three tiny aggregate passes,
    // no full-data shuffle); spreads are |2y - 2*median| so the
    // half-integer median never leaves integer arithmetic, and the F
    // statistic reuses stat_anova's exact BIGINT identity on those
    // spreads. Groups are the 5 market segments — non-null, within
    // RankStats' documented contract.
    "stat_levene" -> QueryDef(
      """WITH y AS (
        |  SELECT c_mktsegment AS seg, CAST(round(c_acctbal) AS BIGINT) AS y
        |  FROM customer),
        |md AS (SELECT seg, CAST(round(2 * quantile_cont(y, 0.5)) AS BIGINT) AS med2
        |       FROM y GROUP BY 1),
        |z AS (SELECT y.seg, abs(2 * y.y - md.med2) AS z2
        |      FROM y JOIN md ON y.seg = md.seg),
        |g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(z2) AS BIGINT) AS s,
        |        CAST(SUM(z2*z2) AS BIGINT) AS q
        |      FROM z GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n,
        |        CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(q) AS BIGINT) AS qt,
        |        CAST(SUM((s * s) // n) AS BIGINT) AS tb
        |      FROM g),
        |f AS (SELECT k, n, tb - (st * st) // n AS ssb_q, qt - tb AS ssw_q FROM m)
        |SELECT k, n, ssb_q, ssw_q,
        |  CAST(round(1000000.0 * ssb_q * (n - k)
        |    / (ssw_q * CAST(k - 1 AS DOUBLE))) AS BIGINT) AS f_micro
        |FROM f""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d).select(col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal) AS BIGINT)").as("y"))
      val md = RankStats.percentiles(y.select(col("seg"), col("y")), "seg", "y",
          Seq(0.5 -> "p50"))
        .select(col("seg").as("mseg"),
          expr("CAST(round(2 * p50) AS BIGINT)").as("med2"))
      val z = y.join(broadcast(md), col("seg") === col("mseg"))
        .select(col("seg"), expr("abs(2 * y - med2)").as("z2"))
      val g = z.groupBy("seg").agg(count(lit(1)).as("n"),
        sum("z2").as("s"), sum(expr("z2*z2")).as("q"))
      val m = g.agg(count(lit(1)).as("k"), sum("n").as("n"),
        sum("s").as("st"), sum("q").as("qt"),
        sum(expr("(s * s) div n")).as("tb"))
      val f = m.select(col("k"), col("n"),
        expr("tb - (st * st) div n").as("ssb_q"),
        expr("qt - tb").as("ssw_q"))
      f.select(col("k"), col("n"), col("ssb_q"), col("ssw_q"),
        expr("""CAST(round(1000000.0 * ssb_q * (n - k)
          / (ssw_q * CAST(k - 1 AS DOUBLE))) AS BIGINT)""").as("f_micro"))
    },

    // WELCH'S T-TEST — two-sample mean comparison WITHOUT the equal-
    // variance assumption (the practitioner default; stat_levene is
    // exactly the check that decides pooled-t vs this). One grouped
    // pass collects exact (n, sum, sum-sq) per segment, a conditional
    // pivot lands both groups on one row, and a single shared
    // double-op sequence (identical text both engines) closes t and
    // the Welch-Satterthwaite df. Map-side combinable; no shuffle
    // beyond the 2-row aggregate.
    "stat_welch_ttest" -> QueryDef(
      """WITH y AS (
        |  SELECT c_mktsegment AS seg, CAST(round(c_acctbal) AS BIGINT) AS y
        |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(y) AS BIGINT) AS s, CAST(SUM(y*y) AS BIGINT) AS q
        |      FROM y GROUP BY 1),
        |w AS (SELECT
        |        MAX(CASE WHEN seg = 'BUILDING' THEN n END) AS n1,
        |        MAX(CASE WHEN seg = 'BUILDING' THEN s END) AS s1,
        |        MAX(CASE WHEN seg = 'BUILDING' THEN q END) AS q1,
        |        MAX(CASE WHEN seg = 'MACHINERY' THEN n END) AS n2,
        |        MAX(CASE WHEN seg = 'MACHINERY' THEN s END) AS s2,
        |        MAX(CASE WHEN seg = 'MACHINERY' THEN q END) AS q2
        |      FROM g),
        |d AS (SELECT n1, n2,
        |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |        CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |        (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |          / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
        |        (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |          / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS v2
        |      FROM w),
        |e AS (SELECT n1, n2,
        |        v1 / CAST(n1 AS DOUBLE) AS a, v2 / CAST(n2 AS DOUBLE) AS b,
        |        m1 - m2 AS dm FROM d)
        |SELECT n1, n2,
        |  CAST(round(dm / sqrt(a + b) * 1000000) AS BIGINT) AS t_micro,
        |  CAST(round((a + b) * (a + b)
        |    / (a * a / (CAST(n1 AS DOUBLE) - 1.0)
        |       + b * b / (CAST(n2 AS DOUBLE) - 1.0)) * 1000000) AS BIGINT)
        |    AS df_micro
        |FROM e""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d)
        .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("seg"),
          expr("CAST(round(c_acctbal) AS BIGINT)").as("y"))
      val g = y.groupBy("seg").agg(count(lit(1)).as("n"),
        sum("y").as("s"), sum(expr("y*y")).as("q"))
      g.agg(
          max(when(col("seg") === "BUILDING", col("n"))).as("n1"),
          max(when(col("seg") === "BUILDING", col("s"))).as("s1"),
          max(when(col("seg") === "BUILDING", col("q"))).as("q1"),
          max(when(col("seg") === "MACHINERY", col("n"))).as("n2"),
          max(when(col("seg") === "MACHINERY", col("s"))).as("s2"),
          max(when(col("seg") === "MACHINERY", col("q"))).as("q2"))
        // double-op chain text-identical to the oracle CTEs
        .selectExpr("n1", "n2",
          "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1",
          "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2",
          """(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
             / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1""",
          """(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
             / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS v2""")
        .selectExpr("n1", "n2",
          "v1 / CAST(n1 AS DOUBLE) AS a", "v2 / CAST(n2 AS DOUBLE) AS b",
          "m1 - m2 AS dm")
        .selectExpr("n1", "n2",
          "CAST(round(dm / sqrt(a + b) * 1000000) AS BIGINT) AS t_micro",
          """CAST(round((a + b) * (a + b)
             / (a * a / (CAST(n1 AS DOUBLE) - 1.0)
                + b * b / (CAST(n2 AS DOUBLE) - 1.0)) * 1000000) AS BIGINT)
             AS df_micro""")
    },

    // POISSON BOOTSTRAP CI — a 95% confidence interval on the mean
    // account balance from 50 deterministic resamples. The classic
    // bootstrap draws n-with-replacement PER resample, which doesn't
    // distribute; the Poisson bootstrap (each row enters resample b
    // with weight ~ Poisson(1)) is the standard streaming/map-side
    // reformulation — and here the weights are DERIVED, not drawn:
    // md5(custkey-b) maps to a uniform in [0, 1e6) that thresholds
    // through the exact Poisson(1) CDF grid. Zero RNG state, so both
    // engines build bit-identical resamples and the CI is hash-gated.
    // One explode (x50) + one partial-agged groupBy; the 50-row mean
    // frame ranks on a single partition. CI bounds are the 2nd and
    // 49th order statistics (2.5%/97.5% of 50).
    "stat_bootstrap_ci" -> QueryDef(
      """WITH y AS (
        |  SELECT c_custkey AS ck, CAST(round(c_acctbal) AS BIGINT) AS y
        |  FROM customer),
        |w AS (SELECT ck, y, b,
        |        CAST(concat('0x', substr(md5(concat(CAST(ck AS VARCHAR), '-',
        |          CAST(b AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 AS u
        |      FROM y, generate_series(1, 50) g(b)),
        |p AS (SELECT b, y,
        |        CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
        |             WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
        |             WHEN u < 996340 THEN 4 ELSE 5 END AS wt
        |      FROM w),
        |m AS (SELECT b,
        |        CAST(SUM(wt * y) * 1000000 // GREATEST(SUM(wt), 1) AS BIGINT)
        |          AS mean_micro
        |      FROM p GROUP BY 1),
        |r AS (SELECT mean_micro, CAST(row_number() OVER
        |        (ORDER BY mean_micro, b) AS BIGINT) AS rk FROM m),
        |f AS (SELECT CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS full_micro
        |      FROM y)
        |SELECT CAST(50 AS BIGINT) AS n_resamples, f.full_micro,
        |  MAX(CASE WHEN rk = 2 THEN mean_micro END) AS ci_lo_micro,
        |  MAX(CASE WHEN rk = 49 THEN mean_micro END) AS ci_hi_micro
        |FROM r, f GROUP BY f.full_micro""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d).select(col("c_custkey").as("ck"),
        expr("CAST(round(c_acctbal) AS BIGINT)").as("y"))
      val w = y.select(col("ck"), col("y"),
          explode(sequence(lit(1), lit(50))).as("b"))
        .withColumn("u", expr(
          """CAST(conv(substring(md5(concat(CAST(ck AS STRING), '-',
             CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) % 1000000"""))
      val p = w.select(col("b"), col("y"),
        expr("""CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
                WHEN u < 996340 THEN 4 ELSE 5 END""").as("wt"))
      val m = p.groupBy("b")
        .agg(expr("CAST(SUM(wt * y) * 1000000 div GREATEST(SUM(wt), 1) AS BIGINT)")
          .as("mean_micro"))
      val r = m.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("mean_micro", "b"))
        .cast("long"))
      val f = y.agg(expr("CAST(SUM(y) * 1000000 div COUNT(*) AS BIGINT)")
        .as("full_micro"))
      r.crossJoin(broadcast(f)).groupBy("full_micro")
        .agg(
          max(when(col("rk") === 2, col("mean_micro"))).as("ci_lo_micro"),
          max(when(col("rk") === 49, col("mean_micro"))).as("ci_hi_micro"))
        .select(lit(50L).as("n_resamples"), col("full_micro"),
          col("ci_lo_micro"), col("ci_hi_micro"))
    },

    // RANDOMIZATION (permutation) TEST — the distribution-free
    // significance test for a two-group mean difference: re-randomize
    // the group labels 99 times, count how often the permuted |diff|
    // reaches the observed one. Labels re-draw via the same md5
    // uniform as the bootstrap (exchangeability under H0 — the
    // Monte-Carlo randomization variant), so both engines build
    // bit-identical permutations and the p-value is hash-gated; all
    // means stay in truncating integer micro units. One explode
    // (x99) + one partial-agged groupBy; the 99-row diff frame
    // reduces against the broadcast observed diff.
    "stat_permutation_test" -> QueryDef(
      """WITH y AS (
        |  SELECT c_custkey AS ck, c_mktsegment AS seg,
        |    CAST(round(c_acctbal) AS BIGINT) AS y
        |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |obs AS (
        |  SELECT CAST(SUM(CASE WHEN seg = 'BUILDING' THEN y END) * 1000000
        |           // COUNT(CASE WHEN seg = 'BUILDING' THEN 1 END)
        |         - SUM(CASE WHEN seg = 'MACHINERY' THEN y END) * 1000000
        |           // COUNT(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS BIGINT)
        |    AS d FROM y),
        |perm AS (SELECT p, y,
        |    CAST(concat('0x', substr(md5(concat(CAST(ck AS VARCHAR), '#',
        |      CAST(p AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 < 500000 AS g1
        |  FROM y, generate_series(1, 99) g(p)),
        |pd AS (
        |  SELECT p,
        |    CAST(SUM(CASE WHEN g1 THEN y END) * 1000000
        |           // GREATEST(COUNT(CASE WHEN g1 THEN 1 END), 1)
        |         - SUM(CASE WHEN NOT g1 THEN y END) * 1000000
        |           // GREATEST(COUNT(CASE WHEN NOT g1 THEN 1 END), 1) AS BIGINT)
        |      AS d
        |  FROM perm GROUP BY 1)
        |SELECT obs.d AS obs_diff_micro,
        |  CAST(COUNT(CASE WHEN ABS(pd.d) >= ABS(obs.d) THEN 1 END) AS BIGINT)
        |    AS n_extreme,
        |  CAST((1 + COUNT(CASE WHEN ABS(pd.d) >= ABS(obs.d) THEN 1 END))
        |       * 1000000 // 100 AS BIGINT) AS p_value_ppm
        |FROM pd, obs GROUP BY obs.d""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d)
        .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"),
          expr("CAST(round(c_acctbal) AS BIGINT)").as("y"))
        .pinned // observed diff + 99 permutations read it
      val obs = y.agg(expr(
        """CAST(SUM(CASE WHEN seg = 'BUILDING' THEN y END) * 1000000
           div COUNT(CASE WHEN seg = 'BUILDING' THEN 1 END)
           - SUM(CASE WHEN seg = 'MACHINERY' THEN y END) * 1000000
           div COUNT(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS BIGINT)""")
        .as("d"))
      val perm = y.select(col("y"), col("ck"),
          explode(sequence(lit(1), lit(99))).as("p"))
        .withColumn("g1", expr(
          """CAST(conv(substring(md5(concat(CAST(ck AS STRING), '#',
             CAST(p AS STRING))), 1, 15), 16, 10) AS BIGINT) % 1000000 < 500000"""))
      val pd = perm.groupBy("p").agg(expr(
        """CAST(SUM(CASE WHEN g1 THEN y END) * 1000000
           div GREATEST(COUNT(CASE WHEN g1 THEN 1 END), 1)
           - SUM(CASE WHEN NOT g1 THEN y END) * 1000000
           div GREATEST(COUNT(CASE WHEN NOT g1 THEN 1 END), 1) AS BIGINT)""")
        .as("d"))
      pd.crossJoin(broadcast(obs.withColumnRenamed("d", "od")))
        .groupBy("od")
        .agg(count(when(abs(col("d")) >= abs(col("od")), 1)).as("n_extreme"))
        .select(col("od").as("obs_diff_micro"), col("n_extreme"),
          expr("CAST((1 + n_extreme) * 1000000 div 100 AS BIGINT)")
            .as("p_value_ppm"))
    },

    // NEYMAN ALLOCATION — how to split a fixed sampling budget across
    // strata: n_h proportional to N_h * S_h (big AND variable strata
    // deserve more samples), the survey-sampling optimum and the
    // principled version of the balanced/stratified samplers already
    // in the family. Per-stratum variance comes from the exact
    // (n, sum, sum-sq) identity; the single sqrt rounds once to a
    // 1e-3 grid (IEEE-exact both engines), after which the
    // allocation of 1000 units is pure truncating integer arithmetic
    // — hash-gated, and the allocations sum to <= 1000 with the
    // documented remainder (no largest-remainder redistribution, so
    // the rule is one line on both engines).
    "sample_neyman_allocation" -> QueryDef(
      """WITH y AS (
        |  SELECT c_mktsegment AS seg, CAST(round(c_acctbal) AS BIGINT) AS y
        |  FROM customer),
        |g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(y) AS BIGINT) AS s, CAST(SUM(y*y) AS BIGINT) AS q
        |      FROM y GROUP BY 1),
        |v AS (SELECT seg, n,
        |        CAST(round(sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
        |          * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - 1.0)) * 1000) AS BIGINT) AS s_milli
        |      FROM g),
        |w AS (SELECT seg, n, s_milli, n * s_milli AS wt FROM v),
        |tw AS (SELECT CAST(SUM(wt) AS BIGINT) AS tw FROM w)
        |SELECT seg, n, s_milli,
        |  CAST(1000 * wt // tw AS BIGINT) AS alloc
        |FROM w, tw ORDER BY seg""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d).select(col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal) AS BIGINT)").as("y"))
      val g = y.groupBy("seg").agg(count(lit(1)).as("n"),
        sum("y").as("s"), sum(expr("y*y")).as("q"))
      val v = g.select(col("seg"), col("n"), expr(
        """CAST(round(sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
           * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0)) * 1000) AS BIGINT)""").as("s_milli"))
      val w = v.select(col("seg"), col("n"), col("s_milli"),
        expr("n * s_milli").as("wt"))
      val tw = w.agg(sum("wt").as("tw"))
      w.crossJoin(broadcast(tw))
        .select(col("seg"), col("n"), col("s_milli"),
          expr("CAST(1000 * wt div tw AS BIGINT)").as("alloc"))
        .orderBy("seg")
    },

    // HORVITZ-THOMPSON ESTIMATOR — unbiased population-total estimate
    // from an UNEQUAL-probability sample: each unit enters with
    // inclusion probability proportional to its (absolute) size, and
    // the estimator re-weights every sampled value by 1/pi. This is
    // the pps-sampling counterpart to the equal-probability samplers
    // in the family — the design that makes a 0.1% sample of a
    // heavy-tailed 100 TB fact table estimate totals the uniform
    // sample cannot. Inclusion draws from the shared md5 uniform
    // (bit-identical both engines), pi in exact milli units with a
    // 20-milli floor (no unbounded 1/pi weights), and the HT sum is
    // pure truncating integer arithmetic — hash-gated, alongside the
    // true total for an honest accuracy read.
    "sample_horvitz_thompson" -> QueryDef(
      """WITH y AS (
        |  SELECT c_custkey AS ck, CAST(round(c_acctbal) AS BIGINT) AS y
        |  FROM customer),
        |mx AS (SELECT CAST(MAX(ABS(y)) AS BIGINT) AS mx FROM y),
        |p AS (SELECT ck, y,
        |        GREATEST(1000 * ABS(y) // mx.mx, 20) AS pi_milli
        |      FROM y, mx),
        |s AS (SELECT ck, y, pi_milli FROM p
        |      WHERE CAST(concat('0x', substr(md5(concat('ht-',
        |        CAST(ck AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 < pi_milli)
        |SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM y) AS n_pop,
        |  CAST(COUNT(*) AS BIGINT) AS n_sample,
        |  CAST(SUM(y * 1000 // pi_milli) AS BIGINT) AS ht_total_est,
        |  (SELECT CAST(SUM(y) AS BIGINT) FROM y) AS true_total
        |FROM s""".stripMargin) { (s, d) =>
      val y = Tables.customer(s, d).select(col("c_custkey").as("ck"),
          expr("CAST(round(c_acctbal) AS BIGINT)").as("y"))
        .pinned // max probe, sample filter, and the two totals
      val mx = y.agg(max(abs(col("y"))).as("mx"))
      val p = y.crossJoin(broadcast(mx))
        .select(col("ck"), col("y"),
          expr("GREATEST(1000 * ABS(y) div mx, 20)").as("pi_milli"))
      val sm = p.where(expr(
        """CAST(conv(substring(md5(concat('ht-', CAST(ck AS STRING))), 1, 15),
           16, 10) AS BIGINT) % 1000""") < col("pi_milli"))
      sm.agg(count(lit(1)).as("n_sample"),
          sum(expr("y * 1000 div pi_milli")).as("ht_total_est"))
        .crossJoin(broadcast(y.agg(count(lit(1)).as("n_pop"),
          sum("y").as("true_total"))))
        .select(col("n_pop"), col("n_sample"), col("ht_total_est"),
          col("true_total"))
    },

    // MULTIPLE LINEAR REGRESSION — price ~ quantity + discount via the
    // closed-form normal equations: ONE partial-aggregated pass
    // collects the nine exact integer moments, then Cramer's rule on
    // the 3x3 system closes the coefficients in a shared double-op
    // sequence (the same identical-text discipline as Jarque-Bera; no
    // iterative solver, no per-row residual pass). This is the
    // multi-feature extension of agg_regression's simple OLS — the
    // map-side-combinable shape that fits a 100 TB regression in one
    // shuffle of nine numbers.
    "stat_ols_multi" -> QueryDef(
      """WITH r AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
        |        CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x1*x1) AS BIGINT) AS s11,
        |        CAST(SUM(x1*x2) AS BIGINT) AS s12,
        |        CAST(SUM(x2*x2) AS BIGINT) AS s22,
        |        CAST(SUM(x1*y) AS BIGINT) AS s1y,
        |        CAST(SUM(x2*y) AS BIGINT) AS s2y
        |      FROM r),
        |d AS (SELECT n,
        |        CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b,
        |        CAST(s2 AS DOUBLE) AS c, CAST(s11 AS DOUBLE) AS dd,
        |        CAST(s12 AS DOUBLE) AS e, CAST(s22 AS DOUBLE) AS f,
        |        CAST(sy AS DOUBLE) AS gy, CAST(s1y AS DOUBLE) AS h,
        |        CAST(s2y AS DOUBLE) AS k
        |      FROM g),
        |m AS (SELECT n, gy, h, k, a, b, c, dd, e, f,
        |        a * (dd * f - e * e) - b * (b * f - c * e)
        |          + c * (b * e - c * dd) AS det
        |      FROM d)
        |SELECT n,
        |  CAST(round((gy * (dd * f - e * e) - b * (h * f - k * e)
        |    + c * (h * e - k * dd)) / det * 1000000) AS BIGINT) AS b0_micro,
        |  CAST(round((a * (h * f - k * e) - gy * (b * f - c * e)
        |    + c * (b * k - c * h)) / det * 1000000) AS BIGINT) AS b1_micro,
        |  CAST(round((a * (dd * k - e * h) - b * (b * k - c * h)
        |    + gy * (b * e - c * dd)) / det * 1000000) AS BIGINT) AS b2_micro
        |FROM m""".stripMargin) { (s, d) =>
      val r = Tables.lineitem(s, d).select(
        col("l_quantity").cast("long").as("x1"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("x2"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      r.agg(count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"),
          sum("y").as("sy"), sum(expr("x1*x1")).as("s11"),
          sum(expr("x1*x2")).as("s12"), sum(expr("x2*x2")).as("s22"),
          sum(expr("x1*y")).as("s1y"), sum(expr("x2*y")).as("s2y"))
        .selectExpr("n",
          "CAST(n AS DOUBLE) AS a", "CAST(s1 AS DOUBLE) AS b",
          "CAST(s2 AS DOUBLE) AS c", "CAST(s11 AS DOUBLE) AS dd",
          "CAST(s12 AS DOUBLE) AS e", "CAST(s22 AS DOUBLE) AS f",
          "CAST(sy AS DOUBLE) AS gy", "CAST(s1y AS DOUBLE) AS h",
          "CAST(s2y AS DOUBLE) AS k")
        .selectExpr("n", "gy", "h", "k", "a", "b", "c", "dd", "e", "f",
          """a * (dd * f - e * e) - b * (b * f - c * e)
             + c * (b * e - c * dd) AS det""")
        .selectExpr("n",
          """CAST(round((gy * (dd * f - e * e) - b * (h * f - k * e)
             + c * (h * e - k * dd)) / det * 1000000) AS BIGINT) AS b0_micro""",
          """CAST(round((a * (h * f - k * e) - gy * (b * f - c * e)
             + c * (b * k - c * h)) / det * 1000000) AS BIGINT) AS b1_micro""",
          """CAST(round((a * (dd * k - e * h) - b * (b * k - c * h)
             + gy * (b * e - c * dd)) / det * 1000000) AS BIGINT) AS b2_micro""")
    },

    // DIFFERENCE-IN-DIFFERENCES — the panel-data causal estimator:
    // (treated post − treated pre) − (control post − control pre)
    // cancels both the group baseline and the common time trend. The
    // assignment here is the deterministic user-id parity (a stand-in
    // for a rollout flag), the cutover is Jan 15, and every cell mean
    // is an exact truncating micro-cents integer off one grouped pass
    // — the whole 2x2 panel plus the estimate is hash-gated and
    // map-side combinable at any event volume.
    "events_did" -> QueryDef(
      """WITH p AS (
        |  SELECT user_id % 2 = 0 AS treated,
        |    ts >= TIMESTAMP '2024-01-15 00:00:00' AS post,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT treated, post, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(vc) * 1000000 // COUNT(*) AS BIGINT) AS mean_micro
        |      FROM p GROUP BY 1, 2),
        |w AS (SELECT
        |        MAX(CASE WHEN treated AND post THEN mean_micro END) AS tp,
        |        MAX(CASE WHEN treated AND NOT post THEN mean_micro END) AS tq,
        |        MAX(CASE WHEN NOT treated AND post THEN mean_micro END) AS cp,
        |        MAX(CASE WHEN NOT treated AND NOT post THEN mean_micro END) AS cq,
        |        CAST(SUM(n) AS BIGINT) AS n_total
        |      FROM g)
        |SELECT n_total, tp, tq, cp, cq,
        |  CAST((tp - tq) - (cp - cq) AS BIGINT) AS did_micro
        |FROM w""".stripMargin) { (s, d) =>
      val p = graft.Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select((col("user_id") % 2 === 0).as("treated"),
          (col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
            .as("post"),
          expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      val g = p.groupBy("treated", "post")
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(vc) * 1000000 div COUNT(*) AS BIGINT)").as("mean_micro"))
      g.agg(
          max(when(col("treated") && col("post"), col("mean_micro"))).as("tp"),
          max(when(col("treated") && !col("post"), col("mean_micro"))).as("tq"),
          max(when(!col("treated") && col("post"), col("mean_micro"))).as("cp"),
          max(when(!col("treated") && !col("post"), col("mean_micro"))).as("cq"),
          sum("n").as("n_total"))
        .select(col("n_total"), col("tp"), col("tq"), col("cp"), col("cq"),
          expr("CAST((tp - tq) - (cp - cq) AS BIGINT)").as("did_micro"))
    },

    // KENDALL'S TAU-B — rank correlation by concordant/discordant
    // pair counting, with the tie correction (the third rank statistic
    // after Spearman and Pearson: pair-order agreement, robust to any
    // monotone transform). Exact O(n^2) pair enumeration is the
    // verify-tier choice here because the series COLLAPSES to the
    // ~30-row daily frame first (click vs view daily maxima, aligned)
    // — the bounded-self-join convention; the scalable path for raw
    // rows is the mergesort inversion count, which this gates. All
    // counts exact BIGINT; one sqrt closes tau-b.
    "stat_kendall_tau" -> QueryDef(
      """WITH day AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    MAX(CASE WHEN event_type = 'click'
        |        THEN CAST(round(value*100) AS BIGINT) END) AS x,
        |    MAX(CASE WHEN event_type = 'view'
        |        THEN CAST(round(value*100) AS BIGINT) END) AS y
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1 HAVING x IS NOT NULL AND y IS NOT NULL),
        |p AS (SELECT
        |        CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS con,
        |        CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS dis,
        |        CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tx,
        |        CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS ty
        |      FROM day a JOIN day b ON a.bucket < b.bucket),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
        |        CAST(SUM(con) AS BIGINT) AS c, CAST(SUM(dis) AS BIGINT) AS d,
        |        CAST(SUM(tx) AS BIGINT) AS tx, CAST(SUM(ty) AS BIGINT) AS ty
        |      FROM p)
        |SELECT np, c, d, tx, ty,
        |  CAST(round(CAST(c - d AS DOUBLE)
        |    / sqrt(CAST((c + d + tx) AS DOUBLE) * CAST((c + d + ty) AS DOUBLE))
        |    * 1000000) AS BIGINT) AS tau_b_micro
        |FROM g""".stripMargin) { (s, d) =>
      val day = graft.Tables.events(s, d)
        .where(col("event_type").isin("click", "view"))
        .groupBy(date_trunc("day", col("ts")).as("bucket"))
        .agg(
          max(when(col("event_type") === "click",
            expr("CAST(round(value*100) AS BIGINT)"))).as("x"),
          max(when(col("event_type") === "view",
            expr("CAST(round(value*100) AS BIGINT)"))).as("y"))
        .where(col("x").isNotNull && col("y").isNotNull)
        .pinned // both sides of the bounded pair join
      val p = day.as("a").join(day.as("b"), col("a.bucket") < col("b.bucket"))
        .select(
          when((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")) > 0, 1)
            .otherwise(0).as("con"),
          when((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")) < 0, 1)
            .otherwise(0).as("dis"),
          when(col("a.x") === col("b.x") && col("a.y") =!= col("b.y"), 1)
            .otherwise(0).as("tx"),
          when(col("a.y") === col("b.y") && col("a.x") =!= col("b.x"), 1)
            .otherwise(0).as("ty"))
      p.agg(count(lit(1)).as("np"), sum("con").as("c"), sum("dis").as("d"),
          sum("tx").as("tx"), sum("ty").as("ty"))
        .selectExpr("np", "c", "d", "tx", "ty",
          """CAST(round(CAST(c - d AS DOUBLE)
             / sqrt(CAST((c + d + tx) AS DOUBLE) * CAST((c + d + ty) AS DOUBLE))
             * 1000000) AS BIGINT) AS tau_b_micro""")
    },

    // WALD-WOLFOWITZ RUNS TEST — is the up/down day sequence random,
    // or does it trend/mean-revert? Counts maximal runs of same-sign
    // daily moves per series and closes the normal-approximation z
    // against the run count a random ordering expects. Sign changes
    // come from one lag window over the daily frame; every count is
    // exact BIGINT and one shared double sequence (sqrt only) closes
    // z — the sequence-randomness diagnostic next to Ljung-Box's
    // autocorrelation portmanteau.
    "stat_runs_test" -> QueryDef(
      """WITH day AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        |    MAX_BY(CAST(round(value*100) AS BIGINT), ts) AS close
        |  FROM events GROUP BY 1, 2),
        |sg AS (
        |  SELECT event_type, bucket,
        |    CASE WHEN close > lag(close) OVER w THEN 1
        |         WHEN close < lag(close) OVER w THEN -1 END AS s
        |  FROM day WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
        |nz AS (SELECT event_type, bucket, s,
        |         lag(s) OVER (PARTITION BY event_type ORDER BY bucket) AS ps
        |       FROM sg WHERE s IS NOT NULL),
        |g AS (SELECT event_type,
        |        CAST(COUNT(CASE WHEN s = 1 THEN 1 END) AS BIGINT) AS n1,
        |        CAST(COUNT(CASE WHEN s = -1 THEN 1 END) AS BIGINT) AS n2,
        |        CAST(1 + COUNT(CASE WHEN ps IS NOT NULL AND s <> ps THEN 1 END)
        |          AS BIGINT) AS runs
        |      FROM nz GROUP BY 1)
        |SELECT event_type, n1, n2, runs,
        |  CAST(round((CAST(runs AS DOUBLE)
        |    - (1.0 + 2.0 * n1 * n2 / (CAST(n1 AS DOUBLE) + n2)))
        |    / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        |           / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2)
        |              * (CAST(n1 AS DOUBLE) + n2 - 1.0)))
        |    * 1000000) AS BIGINT) AS z_micro
        |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy("event_type").orderBy("bucket")
      val day = graft.Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
        .agg(max_by(expr("CAST(round(value*100) AS BIGINT)"), col("ts")).as("close"))
      val sg = day
        .withColumn("s",
          when(col("close") > lag("close", 1).over(wLag), 1)
            .when(col("close") < lag("close", 1).over(wLag), -1))
        .where(col("s").isNotNull)
        .withColumn("ps", lag("s", 1).over(wLag))
      sg.groupBy("event_type")
        .agg(count(when(col("s") === 1, 1)).as("n1"),
          count(when(col("s") === -1, 1)).as("n2"),
          (lit(1) + count(when(col("ps").isNotNull && col("s") =!= col("ps"), 1)))
            .cast("long").as("runs"))
        .selectExpr("event_type", "n1", "n2", "runs",
          """CAST(round((CAST(runs AS DOUBLE)
             - (1.0 + 2.0 * n1 * n2 / (CAST(n1 AS DOUBLE) + n2)))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2)
                       * (CAST(n1 AS DOUBLE) + n2 - 1.0)))
             * 1000000) AS BIGINT) AS z_micro""")
        .orderBy("event_type")
    }
  )
}
