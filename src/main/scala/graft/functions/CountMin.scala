package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch over LONG keys as a typed [[Aggregator]] — the
  * custom-UDAF tier of the extension ladder (a scalar Expression can't
  * hold per-group state; this buffers a depth x width counter matrix
  * with an element-wise-sum merge, exactly the shape Spark's partial
  * aggregation wants: small fixed-size buffer, commutative merge).
  *
  * Determinism: every cell is a SUM of per-row increments, and sums
  * commute — the finished sketch (and so every estimate) is identical
  * under any partitioning or merge order, unlike sampling sketches.
  * Estimates never undercount (one-sided error); overcount is bounded
  * by e*N/width per the standard CM bound, pinned in SketchSpec.
  *
  * Hashing reuses Bloom.scramble (splitmix64) with a per-row seed, so
  * the rows are pairwise-independent enough in practice and the whole
  * scheme is public-constant, RNG-free arithmetic.
  */
object CountMin {

  val Depth = 4
  val Width = 2048

  private def cell(d: Int, key: Long): Int =
    java.lang.Long.remainderUnsigned(
      graft.rel.Bloom.scramble(key ^ (0x9e3779b97f4a7c15L * (d + 1))),
      Width.toLong).toInt + d * Width

  /** The aggregator: IN = key, BUF = flat counter matrix, OUT = same. */
  val agg: Aggregator[Long, Array[Long], Array[Long]] =
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](Depth * Width)
      def reduce(b: Array[Long], key: Long): Array[Long] = {
        var d = 0
        while (d < Depth) { b(cell(d, key)) += 1; d += 1 }
        b
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(b: Array[Long]): Array[Long] = b
      private val longArray: Encoder[Array[Long]] = {
        import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders
        AgnosticEncoders.ArrayEncoder(AgnosticEncoders.PrimitiveLongEncoder, false)
          .asInstanceOf[Encoder[Array[Long]]]
      }
      def bufferEncoder: Encoder[Array[Long]] = longArray
      def outputEncoder: Encoder[Array[Long]] = longArray
    }

  /** Untyped column form for DataFrame use. */
  def sketchCol(key: Column): Column = udaf(agg).apply(key)

  /** Point estimate from a finished sketch: min over the depth rows. */
  def estimate(sketch: Array[Long], key: Long): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < Depth) {
      val c = sketch(cell(d, key)); if (c < best) best = c; d += 1
    }
    best
  }
}
