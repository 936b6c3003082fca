package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentiles without per-group value maps.
  *
  * Spark's `percentile()` aggregate carries a value -> count map
  * through partial aggregation, so its state is O(distinct values)
  * heap per group — the driver bench's one measured hot spot. This
  * instead range-partitions on (group, value), derives every row's
  * global in-group rank from per-slice offsets, and picks only the
  * two rows bracketing each target rank: aggregate state is
  * O(slices), the single wide exchange is the range partitioning
  * itself, and the result is the same quantile_cont linear
  * interpolation. `localCheckpoint` pins the sampled range
  * boundaries so the slice stats and the rank pick see identical
  * slicing.
  */
object RankStats {

  /** One row per group: (g, name...) where each `name` column is the
    * interpolated percentile of `v` at the paired fraction, as
    * DOUBLE. `df` must expose columns `g` (any type) and `v`
    * (numeric); the group column keeps its name in the output.
    */
  def percentiles(df: DataFrame, g: String, v: String,
                  ps: Seq[(Double, String)]): DataFrame = {
    val s = df.sparkSession
    val slices = s.sparkContext.defaultParallelism * 4
    // monotonically_increasing_id = (pid << 33) + consecutive row
    // position, and rows of one group are contiguous inside a sorted
    // slice, so (mid - min(mid) over (g, pid)) is the in-slice rank.
    val sliced = df
      .select(col(g).as("g"), col(v).as("v"))
      .repartitionByRange(slices, col("g"), col("v"))
      .sortWithinPartitions(col("g"), col("v"))
      .select(col("g"), col("v"),
        spark_partition_id().as("pid"),
        monotonically_increasing_id().as("mid"))
      .localCheckpoint()
    val wOff = Window.partitionBy("g").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segs = sliced.groupBy("g", "pid")
      .agg(count(lit(1)).as("c"), min("mid").as("base"))
      .withColumn("off", sum("c").over(wOff) - col("c"))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    val ranked = sliced
      .join(broadcast(segs), Seq("g", "pid"))
      .withColumn("rn", col("off") + (col("mid") - col("base")))
    def pct(p: Double, name: String): Seq[Column] = {
      val r = (col("n") - 1L).cast("double") * p
      val lo = floor(r).cast("long")
      val hi = ceil(r).cast("long")
      Seq(
        max(when(col("rn") === lo, col("v"))).as(s"${name}_lo"),
        max(when(col("rn") === hi, col("v"))).as(s"${name}_hi"),
        max(when(col("rn") === lo, r - lo.cast("double"))).as(s"${name}_frac"))
    }
    val aggs = ps.flatMap { case (p, name) => pct(p, name) }
    ranked
      .groupBy(col("g"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("g").as(g) +: ps.map { case (_, name) =>
        (col(s"${name}_lo") +
          col(s"${name}_frac") * (col(s"${name}_hi") - col(s"${name}_lo")))
          .cast("double").as(name)
      }: _*)
  }
}
