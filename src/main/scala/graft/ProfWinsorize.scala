package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level breakdown of agg_winsorize (VERDICT r6 item 6): times
  * each phase of the pipeline separately so "where do the seconds go"
  * is recorded evidence (BASELINE.md), not a guess. Each phase is
  * timed warm (second run) to exclude codegen/JIT.
  */
object ProfWinsorize {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time2(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val v = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag").as("g"),
      expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("vc"))
    time2("scan v (noop)") {
      v.write.format("noop").mode("overwrite").save()
    }
    time2("repartitionByRange+sort+checkpoint") {
      val s = v.repartitionByRange(spark.sparkContext.defaultParallelism * 4,
          col("g"), col("vc"))
        .sortWithinPartitions(col("g"), col("vc"))
        .select(col("g"), col("vc"), spark_partition_id().as("pid"),
          monotonically_increasing_id().as("mid"))
        .localCheckpoint()
      s.unpersist(blocking = true)
      ()
    }
    time2("RankStats.percentiles end-to-end") {
      graft.rel.RankStats.percentiles(v, "g", "vc",
        Seq(0.05 -> "p05", 0.95 -> "p95")).collect()
      ()
    }
    time2("full agg_winsorize") {
      SparkEntry.queries("agg_winsorize")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
