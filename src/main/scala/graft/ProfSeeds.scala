package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline A/B profiler for the scaled-SemDeDup exemplar-seed scan
  * (r15): prices the warning-free two-level prefix scan
  * ([[graft.vec.VecQueries.exemplarSeeds]]) against the r14
  * global-ROW_NUMBER window it replaced, at whatever corpus
  * `SPARK_GRAFT_SF_DIR` points to. The r14 shape rides Spark's
  * rank-limit pushdown (one TakeOrdered-style job); the r15 shape
  * pays ~5 extra tiny stages (bucket counts, super totals, one-row
  * combine, two partitioned windows) to keep every window partitioned
  * — this main measures that price so BASELINE.md records a number,
  * not a guess. Results: the delta is fixed scheduling overhead
  * (flat in n), not a growth term; see BASELINE.md Round-15.
  *
  * Not part of the query surface — a measurement tool like
  * [[ProfCoreness]] / [[ProfHitsNorm]].
  */
object ProfSeeds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val n = Tables.embeddings(spark, sfDir).count()
    val nlist = math.max(16L, (n + 99L) / 100L)
    def f: DataFrame = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))

    // the r14 shape: one global data-sized rank (fires the WindowExec
    // warning; kept here ONLY as the measurement baseline)
    def seedsGlobalWindow: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.GraftExpressions.vec_dot
      val w = Window.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      f.withColumn("rn", row_number().over(w))
        .where(col("rn") <= nlist)
        .select((col("rn") - 1).cast("long").as("seed_id"),
          col("fv").as("sv"), vec_dot(col("fv"), col("fv")).cast("long").as("sn2"))
    }

    val stageTimes = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageTimes.put(si.stageId,
          (si.name.take(60), si.taskMetrics.executorRunTime))
      }
    })
    def lap(tag: String, df: => DataFrame): Unit = {
      val times = (1 to 4).map { i =>
        RddHygiene.sweptAfter(spark, blocking = true) {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
      }
      println(f"$tag: n=$n nlist=$nlist laps=${times.map(t => f"$t%.2f").mkString("/")} warm=${times.tail.min}%.2f s")
      if (sys.env.contains("PROF_SEEDS_STAGES")) {
        import scala.jdk.CollectionConverters._
        stageTimes.asScala.toSeq.sortBy(-_._2._2).take(6).foreach {
          case (id, (nm, ms)) => println(f"    stage $id%4d ${ms / 1000.0}%8.1f s  $nm")
        }
        stageTimes.clear()
      }
    }

    // the downstream consumer that exposed the interaction: the scaled
    // tier's full assignment fan-out (n×nlist distances through the
    // constant-key broadcast + partial argmin), with each seed rule
    def assignWith(seeds: DataFrame): DataFrame = {
      import graft.functions.GraftExpressions.vec_dot
      val av = f.select(col("vec_id").as("id"), col("fv"))
        .withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
      av.withColumn("jk", col("id") % 1)
        .join(broadcast(seeds.withColumn("jk", col("seed_id") % 1)), "jk")
        .select(col("id"),
          (col("n2") - lit(2L) * vec_dot(col("fv"), col("sv")).cast("long") +
            col("sn2")).as("d2"),
          col("seed_id"))
        .groupBy("id")
        .agg(min(struct(col("d2"), col("seed_id"))).as("best"))
        .select(col("id"), col("best.seed_id").as("cluster"))
    }
    if (sys.env.contains("PROF_SEEDS_EXPLAIN")) {
      println("=== assign plan, two_level seeds ===")
      println(assignWith(graft.vec.VecQueries.exemplarSeeds(f, nlist))
        .queryExecution.executedPlan.toString.take(8000))
      println("=== assign plan, global_window seeds ===")
      println(assignWith(seedsGlobalWindow)
        .queryExecution.executedPlan.toString.take(8000))
      spark.stop(); return
    }
    // candidate replacement for min(struct): pack (d2, seed_id) into
    // one Decimal(38,0) — order-preserving (seed_id < 2^31 strictly
    // below the d2 limb), exact (decimal128 >> the 2^73 worst case),
    // and HASH-aggregable where struct-min forces SortAggregate
    def assignPacked(seeds: DataFrame): DataFrame = {
      import graft.functions.GraftExpressions.vec_dot
      val av = f.select(col("vec_id").as("id"), col("fv"))
        .withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
      av.withColumn("jk", col("id") % 1)
        .join(broadcast(seeds.withColumn("jk", col("seed_id") % 1)), "jk")
        .select(col("id"),
          ((col("n2") - lit(2L) * vec_dot(col("fv"), col("sv")).cast("long") +
            col("sn2")).cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
            lit(2147483648L) + col("seed_id")).as("packed"))
        .groupBy("id")
        .agg(min(col("packed")).as("best"))
        .select(col("id"), (col("best") % lit(2147483648L)).cast("long").as("cluster"))
    }
    // the SHIPPED formulation: ArgMinLong two-long-buffer hash aggregate
    def assignArgMin(seeds: DataFrame): DataFrame = {
      import graft.functions.GraftExpressions.{arg_min_long, vec_dot}
      val av = f.select(col("vec_id").as("id"), col("fv"))
        .withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
      av.withColumn("jk", col("id") % 1)
        .join(broadcast(seeds.withColumn("jk", col("seed_id") % 1)), "jk")
        .select(col("id"),
          (col("n2") - lit(2L) * vec_dot(col("fv"), col("sv")).cast("long") +
            col("sn2")).as("d2"),
          col("seed_id"))
        .groupBy("id")
        .agg(arg_min_long(col("d2"), col("seed_id")).as("cluster"))
    }
    lap("assign ARG_MIN_LONG (shipped)", assignArgMin(
      graft.vec.VecQueries.exemplarSeeds(f, nlist)))
    lap("assign PACKED two_level seeds", assignPacked(
      graft.vec.VecQueries.exemplarSeeds(f, nlist)))
    lap("assign via two_level seeds", assignWith(
      graft.vec.VecQueries.exemplarSeeds(f, nlist)))
    lap("assign via global_window seeds", assignWith(seedsGlobalWindow))
    lap("two_level_scan (shipped)", graft.vec.VecQueries.exemplarSeeds(f, nlist))
    lap("global_window (r14 baseline)", seedsGlobalWindow)
    // decomposition: where the two-level scan's wall goes
    val fk = f.select(col("vec_id"), col("fv"),
        md5(col("vec_id").cast("string")).as("mk"))
      .withColumn("bkt", conv(substring(col("mk"), 1, 4), 16, 10).cast("long"))
    lap("  sub: fk scan only", fk.select("bkt"))
    lap("  sub: bucket counts", fk.groupBy("bkt").agg(count(lit(1)).as("bc")))
    lap("  sub: combine row", fk.groupBy("bkt").agg(count(lit(1)).as("bc"))
      .groupBy(expr("bkt div 256").as("sup"))
      .agg(array_sort(collect_list(struct(col("bkt"), col("bc")))).as("sarr"),
        sum("bc").as("sc"))
      .agg(array_sort(collect_list(struct(col("sup"), col("sc"), col("sarr"))))
        .as("arr")))
    // bit-identity of the two rules (seed set AND numbering)
    val diff = graft.vec.VecQueries.exemplarSeeds(f, nlist)
      .select("seed_id", "sn2")
      .exceptAll(seedsGlobalWindow.select("seed_id", "sn2")).count()
    println(s"rule_diff_rows: $diff (must be 0)")
    spark.stop()
  }
}
