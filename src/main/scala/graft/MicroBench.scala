package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tick._

/** The internal micro-baselines BASELINE.md calls for: ingest
  * throughput, tick range-query latency per group level, rollup-tier
  * speedup vs direct aggregation. Prints one line per metric; results
  * are recorded in BASELINE.md.
  */
object MicroBench {
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // 1. ingest throughput: events -> last-wins upsert into a fresh store
    val root = s"${sys.props("java.io.tmpdir")}/graft_microbench"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val store = new TickStore(root)
    store.createDb(spark, "db")
    val batch = Tables.events(spark, sfDir)
      .select(col("event_type").as("index"), col("ts_ns"),
        map(lit("value"), col("value")).as("value"),
        col("event_id").as("seq"))
      .localCheckpoint() // pre-read: time the ingest, not the source scan
    val n = batch.count()
    val tIngest = time(store.ingest(spark, "db", batch))
    println(f"ingest: $n points in $tIngest%.2f s = ${n / tIngest}%.0f points/s")

    // 2. tick range-query latency per level (store-backed, warm)
    Seq("second", "minute", "hour", "day", "month", "year").foreach { level =>
      val q = TickQuery.fromJson(
        s"""{"index":"click","group":"$level","fields":{"value":{"reducer":"avg"}}}""")
      val src = StoreSource(store, spark, "db")
      TickQueryExec.run(src, q).count() // warm
      val t = time(TickQueryExec.run(src, q).count())
      println(f"tick query level=$level%-7s $t%.3f s")
    }

    // 3. rollup speedup: year-level avg over the full range
    Rollup.materialize(spark, store, "db")
    val yq = TickQuery.fromJson(
      """{"index":"click","group":"year","fields":{"value":{"reducer":"avg"}}}""")
    val direct = time(TickQueryExec.run(StoreSource(store, spark, "db"), yq).count())
    val routed = time(Rollup.query(spark, store, "db", yq).count())
    println(f"year-level: direct=$direct%.3f s routed=$routed%.3f s speedup=${direct / routed}%.1fx")
    spark.stop()
  }
}
