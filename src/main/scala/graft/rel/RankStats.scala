package graft.rel
import graft.Pinned.PinnedOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentiles without per-group value maps AND
  * without shuffling the data.
  *
  * Spark's `percentile()` aggregate carries a value -> count map
  * through partial aggregation, so its state is O(distinct values)
  * heap per group — the driver bench's one measured hot spot. The
  * previous fix here range-partitioned the full relation and pinned
  * the sampled slice bounds with a `localCheckpoint` — exact, but it
  * paid a full-data exchange plus a block-manager materialization
  * (the r6 profile shows that one phase is ~60% of agg_winsorize's
  * runtime, and at 100 TB a full range shuffle is the bottleneck).
  *
  * This version is histogram-refinement selection, the classic
  * distributed k-th-element scheme:
  *   1. per-group envelope: (min, max, count) — map-side combinable,
  *      output = one row per group;
  *   2. exact fixed-width histogram: bucket = monotone map of v into
  *      [0, K); counts per (group, bucket) — map-side combinable,
  *      output ≤ groups×K rows; a prefix sum over that TINY frame
  *      locates the bucket holding each target rank and the rank's
  *      offset within it;
  *   3. candidate refinement: only rows landing in a target bucket
  *      (≤ 2·|percentiles| buckets per group, expected n/K rows each)
  *      are re-aggregated as (value → count); a prefix sum over the
  *      distinct values picks the exact ranked value. Heavy ties
  *      collapse in the map-side combine, so a skewed value never
  *      concentrates rows on one task.
  * Three pruned scans of the 2-column input, zero full-data shuffles,
  * no sampling, no checkpoint — deterministic and exact. The result
  * is the same quantile_cont linear interpolation
  * `lo + frac·(hi − lo)` DuckDB applies, as DOUBLE.
  *
  * Degenerate buckets (all of one group's mass on a single value →
  * min = max) still work: everything lands in bucket 0 and collapses
  * to one (value, count) row in phase 3.
  */
object RankStats {

  private val K = 8192

  /** Monotone bucket id in [0, K): fp subtract/divide/multiply by a
    * positive constant and floor are all order-preserving, so bucket
    * assignment can never invert value order even with rounding.
    * The degenerate-span guard compares the CASTED doubles — the same
    * values the arithmetic divides — so an integral span that
    * collapses to 0.0 under the double cast (distinct BIGINTs beyond
    * 2^53) hits the guard instead of producing NaN bucket ids.
    */
  private def bucketOf(v: Column, mn: Column, mx: Column): Column =
    when(mx.cast("double") === mn.cast("double"), lit(0))
      .otherwise(least(lit(K - 1),
        floor((v.cast("double") - mn.cast("double")) /
          (mx.cast("double") - mn.cast("double")) * K).cast("int")))

  /** One row per group: (g, name...) where each `name` column is the
    * interpolated percentile of `v` at the paired fraction, as
    * DOUBLE. `df` must expose columns `g` (any type) and `v`
    * (numeric); the group column keeps its name in the output. NULL
    * values of `v` are ignored (quantile_cont semantics). A NULL
    * group key is a group like any other (quantile_cont GROUP BY
    * semantics): the key travels wrapped in a one-field struct, so
    * the internal equi-joins compare it null-safely and the NULL
    * group's row survives to the output.
    */
  def percentiles(df: DataFrame, g: String, v: String,
                  ps: Seq[(Double, String)]): DataFrame = {
    val in = df.select(struct(col(g).as("k")).as("g"), col(v).as("v"))
      .where(col("v").isNotNull)

    // phase 1: group envelope. localCheckpoint pins the TINY result
    // (one row per group — not the data, unlike the r5 design) so the
    // three downstream uses don't each re-run the full scan.
    val stats = in.groupBy("g")
      .agg(min("v").as("mn"), max("v").as("mx"), count(lit(1)).as("n"))
      .pinned

    // target ranks: for each percentile, the lo/hi bracketing ranks of
    // r = (n-1)·p and the interpolation fraction — 2·|ps| rows per group
    val psArr = array(ps.map { case (p, name) =>
      struct(lit(p).as("p"), lit(name).as("pname"))
    }: _*)
    val targets = stats
      .select(col("g"), col("n"), explode(psArr).as("t"))
      .select(col("g"), col("n"), col("t.p").as("p"), col("t.pname").as("pname"))
      .withColumn("r", (col("n") - 1L).cast("double") * col("p"))
      .withColumn("lo", floor(col("r")).cast("long"))
      .withColumn("frac", col("r") - floor(col("r")))
      .select(col("g"), col("pname"), col("frac"), explode(array(
        struct(lit("lo").as("kind"), col("lo").as("rank")),
        struct(lit("hi").as("kind"), ceil(col("r")).cast("long").as("rank")))).as("k"))
      .select(col("g"), col("pname"), col("frac"),
        col("k.kind").as("kind"), col("k.rank").as("rank"))

    // phase 2: exact histogram + prefix sum (over ≤ groups×K rows),
    // then place each target rank into its bucket with a local offset
    val hist = in.join(broadcast(stats), "g")
      .groupBy(col("g"), bucketOf(col("v"), col("mn"), col("mx")).as("b"))
      .agg(count(lit(1)).as("c"))
    val wB = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("below", coalesce(sum("c").over(wB), lit(0L)))
    // pinned for the same reason: used twice (bucket list + rank match),
    // and its lineage includes the phase-2 scan
    val placed = targets.join(cum,
        Seq("g"), "inner")
      .where(col("rank") >= col("below") && col("rank") < col("below") + col("c"))
      .select(col("g"), col("pname"), col("frac"), col("kind"),
        col("b"), (col("rank") - col("below")).as("lr"))
      .pinned

    // phase 3: candidate buckets only; collapse to (value, count) so
    // ties never concentrate, prefix-sum the distinct values, pick the
    // value whose local-rank span contains each target offset
    val buckets = placed.select("g", "b").distinct()
    val candCnt = in.join(broadcast(stats), "g")
      .withColumn("b", bucketOf(col("v"), col("mn"), col("mx")))
      .join(broadcast(buckets), Seq("g", "b"))
      .groupBy("g", "b", "v").agg(count(lit(1)).as("cv"))
    val wV = Window.partitionBy("g", "b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val picked = candCnt
      .withColumn("vbelow", coalesce(sum("cv").over(wV), lit(0L)))
      .join(broadcast(placed), Seq("g", "b"))
      .where(col("lr") >= col("vbelow") && col("lr") < col("vbelow") + col("cv"))

    // assemble: lo + frac·(hi − lo) per (g, pname), then one column
    // per requested percentile name
    val byName = picked.groupBy("g", "pname")
      .agg(
        max(when(col("kind") === "lo", col("v"))).as("lov"),
        max(when(col("kind") === "hi", col("v"))).as("hiv"),
        first("frac").as("frac"))
      .withColumn("pv",
        (col("lov").cast("double") +
          col("frac") * (col("hiv").cast("double") - col("lov").cast("double"))))
    byName.groupBy("g")
      .agg(
        max(when(col("pname") === ps.head._2, col("pv"))).as(ps.head._2),
        ps.tail.map { case (_, name) =>
          max(when(col("pname") === name, col("pv"))).as(name)
        }: _*)
      .select(col("g.k").as(g) +: ps.map(p => col(p._2)): _*)
  }
}
