package graft.mm

import org.apache.spark.sql.SparkSession

/** Band-geometry A/B probe for the phash near-dup family (r18 — the
  * r17 verdict's What's-wrong #2 done-bar): for each requested band
  * count, counts the CANDIDATE pair relation (the quantity that grew
  * 9.16M → 101.4M across gen3→gen10 under the fixed 4×14 geometry)
  * and the verified result rows, on an explicit data dir. Evidence
  * prints follow the GateStamp discipline: counts, not just walls, so
  * a degenerate zero-candidate run can never read as a win.
  *
  * Usage: runMain graft.MmBandProbe <dir> <nBands...>
  */
object MmBandProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MmBandProbe <dir> <nBands...>")
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).map(_.toInt).foreach { nBands =>
      val bandBits = (56 + nBands - 1) / nBands
      val t0 = System.nanoTime()
      val (pairs, result) = MmQueries.phashParts(
        spark, dir, nBands, graft.StaticTier.Broadcast)
      val nCand = pairs.count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val res = result.collect()
      val tFull = (System.nanoTime() - t1) / 1e9
      val planted = res.count(_.getLong(0) >= Multimodal.PlantedIdOffset)
      println(f"bands=$nBands×$bandBits space=${nBands.toLong << bandBits}: " +
        f"candidates=$nCand%,d (${tCand}%.2f s) verified_drops=${res.length} " +
        f"planted=$planted/40 full=${tFull}%.2f s")
    }
    spark.stop()
  }
}
