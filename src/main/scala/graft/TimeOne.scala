package graft
import org.apache.spark.sql.SparkSession

/** Warm per-query timing at the driver's bench config: each named
  * query runs 3 laps in ONE session (run1 = cold/JIT — trust run2/3).
  * Passing several names keeps the JVM warm across them, which is the
  * honest steady-state number for envelope/regression reads.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one data dir for BOTH the setup loop and the laps: a divergence
    // would make the setups build index caches for a different corpus
    // than the laps time (semanticHash key misses -> per-probe rebuild)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // queries with registered fixtures (cached index artifacts, store
    // builds) get them ONCE up front, exactly like the official bench,
    // so laps time the query path rather than fixture construction
    SparkEntry.benchSetups.filter { case (n, _) => args.contains(n) }
      .toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try fn(spark, sfDir) catch { case e: Throwable =>
          System.err.println(s"[timeone] setup $n failed: ${e.getMessage}")
        }
      }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val laps = (1 to 3).map { i =>
        // checkpoint blocks accumulate across laps and inflate later
        // runs (RddHygiene scaladoc); setup-built caches predate the
        // lap and stay. blocking=true: evict lap N's blocks BEFORE
        // lap N+1's timed region starts, not concurrently with it.
        val sec = RddHygiene.sweptAfter(spark, blocking = true) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name run$i: $sec%.2f s")
        sec
      }
      println(f"$name warm: ${laps.tail.min}%.2f s")
    }
    spark.stop()
  }
}
