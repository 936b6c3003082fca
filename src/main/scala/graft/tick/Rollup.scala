package graft.tick
import graft.Pinned.PinnedOps

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The materialized-rollup tier: the Spark-native analog of the
  * reference's aggregation pyramid (`node.go:39-53`: every interior
  * pointer carries per-field {sum,max,min,first,last,count} for its
  * subtree, maintained at insert time and read at query time,
  * `cursor.go:269-352`).
  *
  * Design differences forced by a shuffle-parallel engine (SURVEY
  * §7.5): rollup rows carry `first_ts_ns`/`last_ts_ns` alongside
  * `first`/`last` — the reference merges positionally
  * (`node.go:569-571`) which has no meaning when partial aggregates
  * arrive unordered; the timestamps make the merge commutative. Counts
  * are LONG (the reference's uint16 overflows at 65k points/bucket).
  *
  * Layout: `<db>/rollup/<level>/` parquet partitioned by `index`,
  * long-form `(index, bucket, field, sum, max, min, first_ts_ns,
  * first, last_ts_ns, last, count)` — long-form because the field set
  * is dynamic per point (schemaless maps). Coarser levels cascade from
  * the next finer level (minute → hour → day → month → year), each a
  * pure re-merge, so a full build reads the raw points exactly once.
  *
  * At 100 TB this is the read-amplification win the pyramid bought the
  * reference: a year-level query over years of data reads a few
  * thousand rollup rows instead of re-scanning raw points.
  */
object Rollup {

  /** Rollup levels, finest first. */
  val levels: Seq[GroupUnit] =
    Seq(GroupUnit.Minute, GroupUnit.Hour, GroupUnit.Day, GroupUnit.Month, GroupUnit.Year)

  private def levelPath(store: TickStore, db: String, level: GroupUnit) =
    new Path(new Path(store.root, db), s"rollup/${level.name}")

  /** Aggregate a long-form (index, ts, ts_ns, field, v) frame into
    * rollup rows at `level`.
    */
  private def rollFromPoints(longForm: DataFrame, level: GroupUnit): DataFrame =
    longForm
      .groupBy(col("index"), GroupSpec(1, level).bucket(col("ts")).as("bucket"), col("field"))
      .agg(
        // decimal: exact + order-independent, so rollup answers equal
        // direct aggregation bit-for-bit (and match the oracle)
        sum(col("v").cast("decimal(20,4)")).as("sum"),
        max(col("v")).as("max"),
        min(col("v")).as("min"),
        min(col("ts_ns")).as("first_ts_ns"),
        min_by(col("v"), col("ts_ns")).as("first"),
        max(col("ts_ns")).as("last_ts_ns"),
        max_by(col("v"), col("ts_ns")).as("last"),
        count(col("v")).as("count"))

  /** Re-merge finer rollup rows into the next coarser level — the
    * commutative version of the reference's interior-node reduce
    * (`node.go:553-577`, including the min-merge bug fixed).
    */
  private def rollUp(finer: DataFrame, level: GroupUnit): DataFrame =
    finer
      .groupBy(col("index"),
        GroupSpec(1, level).bucket(col("bucket")).as("bucket"), col("field"))
      .agg(
        sum(col("sum")).as("sum"),
        max(col("max")).as("max"),
        min(col("min")).as("min"),
        min(col("first_ts_ns")).as("first_ts_ns"),
        min_by(col("first"), col("first_ts_ns")).as("first"),
        max(col("last_ts_ns")).as("last_ts_ns"),
        max_by(col("last"), col("last_ts_ns")).as("last"),
        sum(col("count")).as("count"))

  /** Fine levels (minute/hour/day) are additionally partitioned by the
    * bucket's year-month, so incremental refresh rewrites only the
    * touched (index, ym) slices; month/year tables are tiny and stay
    * index-partitioned.
    */
  private def isFine(level: GroupUnit): Boolean =
    level == GroupUnit.Minute || level == GroupUnit.Hour || level == GroupUnit.Day

  private def ymOf(bucket: Column): Column = date_format(bucket, "yyyy-MM")

  private def write(df: DataFrame, store: TickStore, db: String, level: GroupUnit,
      mode: SaveMode): Unit = {
    val out = levelPath(store, db, level).toString
    if (isFine(level))
      df.withColumn("ym", ymOf(col("bucket")))
        .pinned // cut lineage: may read what it overwrites
        .repartition(col("index"))
        .write.partitionBy("index", "ym")
        .option("partitionOverwriteMode", "dynamic")
        .mode(mode).parquet(out)
    else
      df.pinned
        .repartition(col("index"))
        .write.partitionBy("index")
        .option("partitionOverwriteMode", "dynamic")
        .mode(mode).parquet(out)
  }

  /** Build (or rebuild) every rollup level for a db. Raw points are
    * read once; each coarser level derives from the finer one.
    */
  def materialize(spark: SparkSession, store: TickStore, db: String): Unit = {
    if (store.read(spark, db).isEmpty) return // nothing to roll up
    val longForm = store.read(spark, db)
      .select(col("index"), col("ts"), col("ts_ns"),
        explode(col("value")).as(Seq("field", "v")))
    var current: DataFrame = null
    levels.foreach { level =>
      val rolled =
        if (current == null) rollFromPoints(longForm, level)
        else rollUp(current, level)
      write(rolled, store, db, level, SaveMode.Overwrite)
      current = read(spark, store, db, level)
    }
  }

  /** Incrementally refresh the rollups after a mutation that touched
    * the given (index, day) point partitions — the analog of the
    * reference's insert-time pyramid reduce along the dirty branch
    * (`node.go:523-579`), at partition granularity:
    *
    *  - minute/hour/day buckets of the touched days are recomputed from
    *    the touched points only, and merged into their (index, ym)
    *    rollup partitions (other rows of those partitions survive via
    *    anti-join; untouched partitions are not rewritten);
    *  - month/year buckets covering the touched days are re-derived
    *    from the freshly refreshed day level — reading tiny rollup
    *    rows, never raw points.
    *
    * Cost: O(points of touched days + rollup rows of touched months).
    */
  def refresh(spark: SparkSession, store: TickStore, db: String,
      touched: Seq[(String, String)]): Unit = {
    if (touched.isEmpty || !exists(spark, store, db)) return
    import spark.implicits._
    val touchedDf = touched.toDF("index", "day")
    val touchedYmDf = touched.map { case (i, d) => (i, d.substring(0, 7)) }
      .distinct.toDF("index", "ym")

    val pts = store.read(spark, db)
      .join(broadcast(touchedDf), Seq("index", "day"), "left_semi")
      .select(col("index"), col("ts"), col("ts_ns"),
        explode(col("value")).as(Seq("field", "v")))

    // fine levels: recompute touched-day buckets from points
    Seq(GroupUnit.Minute, GroupUnit.Hour, GroupUnit.Day).foreach { level =>
      val recomputed = rollFromPoints(pts, level)
      val survivors = read(spark, store, db, level)
        .join(broadcast(touchedYmDf), Seq("index", "ym"), "left_semi")
        .withColumn("day", date_format(col("bucket"), "yyyy-MM-dd"))
        .join(broadcast(touchedDf), Seq("index", "day"), "left_anti")
        .select("index", "bucket", "field", "sum", "max", "min",
          "first_ts_ns", "first", "last_ts_ns", "last", "count")
      val newContent = survivors.unionByName(recomputed).pinned
      // a touched ym partition with no rows in the new content would be
      // skipped by dynamic overwrite and keep stale files: compute the
      // survivor partition set BEFORE writing, drop the emptied dirs after
      val t = touchedYmDf.toDF("t_index", "t_ym")
      val keptYms = newContent
        .join(broadcast(t),
          col("index") === col("t_index") && ymOf(col("bucket")) === col("t_ym"), "left_semi")
        .select(col("index"), ymOf(col("bucket")).as("ym"))
        .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
      write(newContent, store, db, level, SaveMode.Overwrite)
      val fs = levelPath(store, db, level)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touchedYmDf.collect().foreach { r =>
        val (i, ym) = (r.getString(0), r.getString(1))
        if (!keptYms.contains((i, ym))) {
          val p = new Path(levelPath(store, db, level), s"index=${TickStore.escape(i)}/ym=$ym")
          if (fs.exists(p)) fs.delete(p, true)
        }
      }
    }

    // calendar levels: cascade from the refreshed finer level
    Seq(GroupUnit.Month -> GroupUnit.Day, GroupUnit.Year -> GroupUnit.Month).foreach {
      case (level, finerLevel) =>
        val bucketTrunc = GroupSpec(1, level)
        val finer = read(spark, store, db, finerLevel)
        val affectedBuckets = touchedYmDf
          .withColumn("bucket", bucketTrunc.bucket(to_timestamp(concat(col("ym"), lit("-01")))))
          .select("index", "bucket").distinct()
        val recomputed = rollUp(
          finer.withColumn("qb", bucketTrunc.bucket(col("bucket")))
            .join(broadcast(affectedBuckets.withColumnRenamed("bucket", "qb")),
              Seq("index", "qb"), "left_semi")
            .drop("qb"),
          level)
        val survivors = read(spark, store, db, level)
          .join(broadcast(affectedBuckets), Seq("index", "bucket"), "left_anti")
          .select("index", "bucket", "field", "sum", "max", "min",
            "first_ts_ns", "first", "last_ts_ns", "last", "count")
        write(survivors.unionByName(recomputed), store, db, level, SaveMode.Overwrite)
    }
  }


  /** Stat-row schema as read back (sum widened to the max precision any
    * level's cascaded decimal sums can reach) — used only to keep an
    * EMPTY level directory readable; non-empty reads take the files'
    * own schema.
    */
  private def emptyFrame(spark: SparkSession, level: GroupUnit): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = Seq(
      StructField("index", StringType), StructField("bucket", TimestampType),
      StructField("field", StringType), StructField("sum", DecimalType(38, 4)),
      StructField("max", DoubleType), StructField("min", DoubleType),
      StructField("first_ts_ns", LongType), StructField("first", DoubleType),
      StructField("last_ts_ns", LongType), StructField("last", DoubleType),
      StructField("count", LongType)) ++
      (if (isFine(level)) Seq(StructField("ym", StringType)) else Nil)
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields))
  }

  def read(spark: SparkSession, store: TickStore, db: String, level: GroupUnit): DataFrame = {
    val p = levelPath(store, db, level)
    val hasFiles = {
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a level dir holding only _SUCCESS (empty db materialize, or a
      // delete that emptied the level) must read as empty, not throw
      // schema-inference errors that brick every later ingest/query
      f.exists(p) && f.listStatus(p).exists(s =>
        s.isDirectory || !s.getPath.getName.startsWith("_"))
    }
    if (hasFiles)
      spark.read
        .option("basePath", p.toString)
        .parquet(p.toString)
    else emptyFrame(spark, level)
  }

  def exists(spark: SparkSession, store: TickStore, db: String): Boolean = {
    val p = levelPath(store, db, levels.head)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Can `q` be answered from the rollup tier? Requires: a group level
    * at or coarser than a rollup level whose buckets nest inside the
    * query's buckets, and from/to aligned to the rollup grid (partial
    * edge buckets would need the raw points).
    */
  def routable(q: TickQuery): Option[GroupUnit] = q.group.flatMap { spec =>
    val candidate = spec.unit match {
      case GroupUnit.Second => None // finer than the finest rollup
      case u => Some(u)
    }
    candidate.filter { u =>
      val unitNs: Long = u match {
        case GroupUnit.Minute => 60L * 1000000000L
        case GroupUnit.Hour   => 3600L * 1000000000L
        case GroupUnit.Day    => 86400L * 1000000000L
        case _                => 0L
      }
      def aligned(i: java.time.Instant): Boolean = u match {
        case GroupUnit.Month | GroupUnit.Year =>
          val z = i.atZone(java.time.ZoneOffset.UTC)
          z.getDayOfMonth == 1 && z.toLocalTime == java.time.LocalTime.MIDNIGHT &&
            (u == GroupUnit.Month || z.getMonthValue == 1)
        case _ =>
          val ns = i.getEpochSecond * 1000000000L + i.getNano
          ns % unitNs == 0
      }
      q.from.forall(aligned) && q.to.forall(aligned)
    }
  }

  /** Answer a tick query from the rollup tier (caller must have checked
    * [[routable]]). Reads the rollup at the query's own unit and
    * re-merges multiplier buckets.
    */
  def query(spark: SparkSession, store: TickStore, db: String, q: TickQuery): DataFrame = {
    require(q.fields.nonEmpty,
      "tick query must request at least one field (empty \"fields\" document)")
    val unit = routable(q).getOrElse(
      throw new IllegalArgumentException(s"query not routable through rollups: $q"))
    val spec = q.group.get
    val nsOf = (i: java.time.Instant) => i.getEpochSecond * 1000000000L + i.getNano
    val base = read(spark, store, db, unit)
      .where(col("index") === q.index)
    val ranged = Seq(
      q.from.map(i => col("bucket") >= lit(java.sql.Timestamp.from(i))),
      q.to.map(i => col("bucket") < lit(java.sql.Timestamp.from(i)))
    ).flatten.foldLeft(base)(_ where _)

    // re-bucket (multiplier > 1 merges several rollup buckets into one)
    val rebucketed = ranged.withColumn("qbucket", spec.bucket(col("bucket")))
    val perField = rebucketed.groupBy(col("qbucket"), col("field"))
      .agg(
        sum(col("sum")).as("sum"),
        max(col("max")).as("max"),
        min(col("min")).as("min"),
        min_by(col("first"), col("first_ts_ns")).as("first"),
        max_by(col("last"), col("last_ts_ns")).as("last"),
        sum(col("count")).as("count"))

    // perField holds exactly one row per (qbucket, field): picking a
    // field's merged stat is a single-non-null max(when(...))
    val aggCols: Seq[Column] = q.fields.map { case (f, red) =>
      def pick(stat: String): Column = max(when(col("field") === f, col(stat)))
      val c = red match {
        case "sum"        => pick("sum").cast("double")
        case "max"        => pick("max")
        case "min"        => pick("min")
        case "first"      => pick("first")
        case "last"       => pick("last")
        // coalesce: count of a field absent from the bucket is 0 on the
        // raw path (count over all-null) and must stay 0 when routed
        case "count"      => coalesce(pick("count"), lit(0L))
        case "avg" | "ma" => pick("sum").cast("double") / pick("count")
        case other => throw new IllegalArgumentException(s"unknown reducer: '$other'")
      }
      c.as(TickQueryExec.outName(f, red))
    }
    perField
      .groupBy(col("qbucket").as("bucket"))
      .agg(aggCols.head, aggCols.tail: _*)
      .orderBy("bucket")
  }
}
