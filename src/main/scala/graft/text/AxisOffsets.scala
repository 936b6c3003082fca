package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-LEVEL exact exclusive prefix sums over a bucket axis — the
  * shared machinery of the two-phase global ranks (sample_weighted's
  * doc_id-range axis, sample_dsir_select's value axis).
  *
  * The r17 two-phase rewrite replaced each query's GLOBAL
  * single-partition pass over the docs with a per-bucket window plus
  * an unpartitioned prefix sum over the bucket AXIS — but that axis
  * still flowed through one task, with its ceiling stated only in
  * prose ("widen the 4096-doc bucket at extreme corpus sizes"). r18
  * converts the knob to code: the axis itself is folded once more
  * through SUPER-buckets of [[SuperWidth]] buckets, so the one
  * unpartitioned window in the whole construction runs over
  * `axisRows / SuperWidth` rows — O(n / 4096²) for sample_weighted
  * (≈ 600 rows at 10^10 docs; the prose ceiling is now a spec
  * assertion, AxisOffsetsSpec) — and every other pass is partitioned:
  *
  *   off(b)  = Σ_{b' < b} v(b')
  *           = soff(sb(b)) + Σ_{b' < b, sb(b') = sb(b)} v(b')
  *
  * with `soff` the exclusive prefix over per-super-bucket totals
  * (the tiny unpartitioned window) and the in-super-bucket prefix a
  * `partitionBy(sb)` window. Exact integer arithmetic throughout —
  * callers' cumulative values are bit-identical to a single global
  * prefix sum, which is what keeps both queries hash-green against
  * their single-window oracles.
  */
object AxisOffsets {

  /** Buckets per super-bucket. One more level would be O(n/4096³) —
    * add it when a corpus puts more than ~10^6 rows through the super
    * axis, i.e. past ~10^13 docs for sample_weighted's 4096-doc
    * buckets (AxisOffsetsSpec pins the axis arithmetic; the sf0.1
    * tripwire in SlowScaleSpec pins the real axis sizes).
    */
  val SuperWidth = 4096L

  /** Exclusive prefix sum of `value` over ascending `bkt` for a
    * per-bucket relation (one row per bucket): returns
    * `(bkt, off)` where `off(b) = Σ_{b' < b} value(b')`. `bkt` may be
    * negative (sample_dsir_select's negated value axis) — the
    * super-bucket is an exact integer floor-division, not a
    * truncation toward zero.
    */
  def exclusivePrefix(perBucket: DataFrame, bkt: String, value: String): DataFrame = {
    // exact floor-div for possibly-negative bucket ids: pmod is the
    // nonnegative remainder, so (b - pmod) / w is floor(b / w) in
    // pure integer arithmetic (no double rounding at any magnitude)
    val sb = ((col(bkt) - pmod(col(bkt), lit(SuperWidth))) / SuperWidth).cast("long")
    val withSb = perBucket.select(col(bkt), col(value).as("_v"), sb.as("_sb"))
    val sup = withSb.groupBy("_sb").agg(sum("_v").as("_sw"))
    // the ONE unpartitioned window — over the super axis only
    val wSup = Window.orderBy("_sb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val supOffs = sup.select(col("_sb"),
      coalesce(sum("_sw").over(wSup), lit(0L)).as("_soff"))
    val wIn = Window.partitionBy("_sb").orderBy(bkt)
      .rowsBetween(Window.unboundedPreceding, -1)
    withSb.join(broadcast(supOffs), "_sb")
      .select(col(bkt),
        (coalesce(sum("_v").over(wIn), lit(0L)) + col("_soff")).as("off"))
  }
}
