package graft
import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named queries to files —
  * the optimization-round evidence artifacts (`plans/rNN/<q>_<tag>.txt`).
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <query...>
  * Plans are captured at the bench config (sf dir from
  * SPARK_GRAFT_SF_DIR, default sf0.1) WITHOUT executing the query, so
  * the file shows the pre-AQE physical plan — the same artifact
  * `explain("formatted")` prints interactively.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val (outDir, tag, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.benchSetups.filter { case (n, _) => names.contains(n) }
      .toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try fn(spark, sfDir) catch { case e: Throwable =>
          System.err.println(s"[plandump] setup $n failed: ${e.getMessage}")
        }
      }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
