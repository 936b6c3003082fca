package graft

import org.apache.spark.sql.SparkSession

/** Diagnostics: run each contract query twice in one session to split
  * fixed overhead (codegen/session warm-up) from steady-state cost.
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t1 = time(fn(spark, sfDir).count())
      val t2 = time(fn(spark, sfDir).count())
      val t3 = time(fn(spark, sfDir).count())
      println(f"$name%-22s cold=$t1%6.2f warm=$t2%6.2f warm2=$t3%6.2f")
    }
    spark.stop()
  }
}
