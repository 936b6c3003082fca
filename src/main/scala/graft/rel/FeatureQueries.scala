package graft.rel

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
      val n = dv.agg(sum("c").as("n"))
      cum.crossJoin(broadcast(n))
        .select(expr("(10 * cum + n - 1) div n").as("bin"), col("c"), col("v"))
        .groupBy("bin").agg(sum("c").as("n_rows"),
          min("v").as("lo_cents"), max("v").as("hi_cents"))
        .orderBy("bin")
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
    }
  )
}
