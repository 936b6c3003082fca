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
  * Hashing (r11): the per-row cell index is md5-derived — the first
  * 15 hex chars of md5("d:key") taken as a 60-bit integer, mod Width —
  * the repo's engine-portable digest discipline. That makes the WHOLE
  * sketch expressible in ANSI SQL (a cell's counter is Σ counts of
  * the keys hashing to it), so sketch_heavy_hitters carries a real
  * chained-CTE DuckDB oracle instead of a rows-only check. md5 per
  * (row, depth) costs ~2x a splitmix round trip at the JVM level;
  * the sketch build stays one partial-aggregated pass either way.
  */
object CountMin {

  val Depth = 4
  val Width = 2048

  /** DuckDB mirror of [[cell]]'s intra-row index (without the
    * `d * Width` flattening offset, which is a buffer-layout detail).
    */
  def cellSql(d: String, key: String): String =
    s"CAST(concat('0x', substr(md5(concat($d, ':', $key)), 1, 15)) AS BIGINT) % $Width"

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def cell(d: Int, key: Long): Int = {
    val dig = md5.get()
    dig.reset()
    val bytes = dig.digest(
      s"$d:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars of the digest = the first 8 bytes' big-endian
    // unsigned value >> 4 (60 bits, non-negative) — bit-identical to
    // CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    ((v >>> 4) % Width).toInt + d * Width
  }

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
