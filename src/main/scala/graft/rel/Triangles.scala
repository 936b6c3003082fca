package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => cnt} // `count` below shadows functions.count

/** Distributed triangle counting by degree-ordered edge orientation —
  * the MapReduce-classic formulation (Suri & Vassilvitskii's "Counting
  * triangles and the curse of the last reducer", WWW'11): orient every
  * undirected edge from its (degree, id)-smaller endpoint to the
  * larger, so
  *
  *  - each triangle is counted exactly once, at its smallest corner;
  *  - per-node wedge generation is bounded by OUT-degree, which the
  *    orientation caps at ~sqrt(m) — the hub that explodes a naive
  *    self-join (degree d -> d^2 wedges) has high IN-degree but low
  *    out-degree, so "the last reducer" never materializes.
  *
  * Plan shape: one shuffle of the oriented edges on src for the wedge
  * self-join, then an equi-join of the wedges against the oriented
  * edge set to find closing edges (broadcast here; a shuffled hash
  * join at larger edge sets — same shape, no driver involvement).
  */
object Triangles {

  /** 1-row DataFrame `n_triangles` for an undirected edge set (u, v)
    * with u < v and no duplicates.
    */
  def trianglesDf(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(cnt(lit(1)).as("dg"))
    def key(d: String, n: String) = struct(col(d).as("dg"), col(n).as("id"))
    val ed = e
      .join(broadcast(deg.select(col("n").as("u"), col("dg").as("du"))), "u")
      .join(broadcast(deg.select(col("n").as("v"), col("dg").as("dv"))), "v")
      .select(
        when(key("du", "u") < key("dv", "v"), col("u")).otherwise(col("v")).as("src"),
        when(key("du", "u") < key("dv", "v"), key("dv", "v"))
          .otherwise(key("du", "u")).as("dstk"))
    val wedges = ed.as("x").join(ed.as("y"),
        col("x.src") === col("y.src") && col("x.dstk") < col("y.dstk"))
      .select(col("x.dstk.id").as("wa"), col("y.dstk.id").as("wb"))
    // a wedge (s; a, b) with (da,a) < (db,b) closes iff the edge a-b
    // exists — and the total order guarantees it is oriented a->b, so
    // ONE equi-join direction suffices and each triangle lands once
    val closing = ed.select(col("src").as("wa"), col("dstk.id").as("wb"))
    wedges.join(broadcast(closing), Seq("wa", "wb"))
      .agg(cnt(lit(1)).as("n_triangles"))
  }

  /** Eager count, for specs. */
  def count(e: DataFrame): Long =
    trianglesDf(e).collect().head.getLong(0)
}
