package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B evidence for the HITS normalizer tiers (r13 VERDICT
  * What's-wrong #3: "TwoPhaseNorm is pinned but never measured"):
  * times [[rel.GraphExtras.WindowNorm]] (the shipped bench path — an
  * empty-frame `sum(x) OVER ()`, one single-task funnel per
  * half-round, zero checkpoint writes) against
  * [[rel.GraphExtras.TwoPhaseNorm]] (the billion-node tier —
  * partial-agg to one total row + broadcast join-back, fully
  * parallel, one localCheckpoint per half-round) on the graph_hits
  * edge list, same pinned edges, same rounds, shuffle-bytes listener.
  * Bit-equality of the two tiers is already pinned in GraphExtrasSpec;
  * this records the PRICE of the knob. Run one variant per JVM
  * (`counting`-style CLI arg: window | twophase) — the ProfCoreness
  * protocol: wall comparisons across variants are only honest in
  * separate JVMs. Recorded in BASELINE.md Round-14.
  */
object ProfHitsNorm {

  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("window") // window | twophase
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          }
        }
      })
    // the graph_hits edge build, pinned ONCE outside the laps so the
    // A/B times only the 3 HITS rounds under each normalizer
    val e = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_suppkey").as("v"))
      .distinct()
      .localCheckpoint()
    val ns = variant match {
      case "twophase" => rel.GraphExtras.TwoPhaseNorm
      case _          => rel.GraphExtras.WindowNorm
    }
    (1 to 4).foreach { i =>
      val w0 = shuffleWrite.get; val r0 = shuffleRecords.get
      val sec = RddHygiene.sweptAfter(spark, blocking = true) {
        val t0 = System.nanoTime()
        rel.GraphExtras.hitsAuthorities(e, rounds = 3, normStrategy = ns)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] hits/$variant run$i: $sec%.2f s, shuffleWrite " +
        f"${(shuffleWrite.get - w0) / 1048576.0}%.1f MiB / " +
        f"${shuffleRecords.get - r0}%d rows")
    }
    spark.stop()
  }
}
