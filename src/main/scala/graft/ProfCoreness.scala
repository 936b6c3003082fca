package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B evidence for the r13 coreness rewrite (VERDICT r12 item 1):
  * times the COUNTING h-index round (value-bucket partial agg +
  * cumulative-count window over collapsed buckets — the shipped
  * `GraphExtras.corenessHIndex`) against the retired RANK formulation
  * (row_number over every edge-joined row, the r12 plan) on the same
  * pinned edge list, same rounds, same session. Both produce
  * identical values (the h-index identity proven at corenessHIndex);
  * what differs is the plan: rank sorts O(E) rows per round where
  * counting exchanges only the (node, value) buckets. Run with
  * SPARK_GRAFT_SF_DIR at the generated slices (graft.ScaleGen) to see
  * the gap grow with scale — recorded in BASELINE.md Round-13.
  */
object ProfCoreness {

  /** The r12 rank formulation, kept verbatim for the A/B. */
  private def corenessRank(und: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ed = und.localCheckpoint()
    var core: DataFrame = ed.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("a").orderBy(col("c").desc)
    (1 to rounds).foreach { _ =>
      core = ed.join(broadcast(core), col("node") === col("b"))
        .select(col("a"), col("c"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("a").as("node"))
        .agg(max(least(col("rn"), col("c"))).as("c"))
    }
    core
  }

  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("both") // counting | rank | both
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // shuffle-volume accounting: the architectural claim is that the
    // counting round EXCHANGES only (node, value) buckets where the
    // rank round exchanges (and sorts) every edge-joined row — bytes
    // written to shuffle is the scale-portable measure (wall at
    // local[32] is dominated by whichever stage the page cache favors)
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
    val e = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    // pin the edge build ONCE outside both variants so the A/B times
    // only the h-index rounds, not the shared orders⋈lineitem scan
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    def lap(label: String)(f: => DataFrame): Unit = (1 to 4).foreach { i =>
      val w0 = shuffleWrite.get; val r0 = shuffleRecords.get
      val sec = RddHygiene.sweptAfter(spark, blocking = true) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label run$i: $sec%.2f s, shuffleWrite " +
        f"${(shuffleWrite.get - w0) / 1048576.0}%.1f MiB / " +
        f"${shuffleRecords.get - r0}%d rows")
    }
    if (variant != "rank") lap("counting (shipped)")(rel.GraphExtras.corenessHIndex(und, 3))
    if (variant != "counting") lap("rank (retired r12)")(corenessRank(und, 3))
    // equality: the two formulations must agree bit-for-bit
    if (variant == "both") {
      val a = rel.GraphExtras.corenessHIndex(und, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val b = corenessRank(und, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      require(a == b, s"formulations diverged: ${a.size} vs ${b.size} nodes")
      println(s"[prof] equality: ${a.size} nodes identical under both formulations")
    }
    spark.stop()
  }
}
