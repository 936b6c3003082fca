package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet store with snapshot isolation and time travel —
  * the lakehouse commit protocol (Delta/Iceberg's core idea) reduced
  * to its essentials on plain parquet + a manifest-per-version:
  *
  *  - data lives in immutable per-commit partition directories
  *    (`data/v<N>/<part>=...`); a commit never rewrites a prior
  *    version's files
  *  - each version is a MANIFEST (`_versions/v<N>.manifest`) mapping
  *    partition value -> the directory that holds that partition's
  *    rows AS OF the version; unchanged partitions carry the previous
  *    manifest's entry forward, so a commit costs O(touched
  *    partitions) storage and the untouched ones are physically SHARED
  *    between snapshots
  *  - commits are atomic via write-temp + rename of the manifest (the
  *    single mutation readers resolve); a reader of version N sees an
  *    immutable file set no later commit can disturb
  *
  * At 100 TB this is the difference between "reproduce last week's
  * training run" being a free manifest read vs impossible: time travel
  * is just `readVersion(v)`, and concurrent readers never block
  * writers. Rows carry (key STRING, part STRING, seq LONG, vc LONG);
  * upsert semantics are last-writer-wins per (key, part) with higher
  * `seq` winning inside a batch — resolved distributed, one shuffle
  * over the touched partitions only.
  */
object SnapshotStore {

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(base: String, v: Int) =
    new Path(s"$base/_versions/v$v.manifest")

  /** Latest committed version, 0 when the store is empty. */
  def currentVersion(spark: SparkSession, base: String): Int = {
    val dir = new Path(s"$base/_versions")
    val f = fs(spark, base)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt
      }.foldLeft(0)(math.max)
  }

  private[sources] def readManifest(spark: SparkSession, base: String, v: Int): Map[String, String] = {
    val f = fs(spark, base)
    if (v == 0 || !f.exists(manifestPath(base, v))) Map.empty
    else {
      val in = f.open(manifestPath(base, v))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      txt.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(part, dir) = line.split("\t", 2); part -> dir
      }.toMap
    }
  } // (missing manifest == empty: readVersion turns that into a clear error)

  /** Commit `batch` (columns: key, part, seq, vc) as the next version:
    * last-write-wins upsert against the current snapshot, touching only
    * the partitions present in the batch. Returns the new version.
    */
  def commit(spark: SparkSession, base: String, batch: DataFrame): Int = {
    val v = currentVersion(spark, base)
    val next = v + 1
    val prev = readManifest(spark, base, v)
    val touched = batch.select("part").distinct().collect().map(_.getString(0))

    // merge incoming rows with the touched partitions' current rows;
    // win = max (gen, seq) per (key, part) — deterministic. Partition
    // dirs store only (key, seq, vc) — partitionBy moved `part` into
    // the directory name — so re-attach it per dir like readVersion.
    val existingParts = touched.toSeq.flatMap(p => prev.get(p).map(p -> _))
    val incoming = batch.select(col("key"), col("part"), col("seq"), col("vc"))
      .withColumn("gen", lit(1))
    val unioned =
      if (existingParts.isEmpty) incoming
      else incoming.unionByName(
        existingParts.map { case (p, dir) =>
          spark.read.parquet(dir).withColumn("part", lit(p))
        }.reduce(_ unionByName _)
          .select(col("key"), col("part"), col("seq"), col("vc"))
          .withColumn("gen", lit(0)))
    // LWW applies to the batch itself too: within-batch duplicate keys
    // resolve by seq before anything lands on disk. vc closes the
    // order into a total one, so equal-seq duplicates still resolve
    // deterministically instead of by partition luck.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key", "part")
      .orderBy(col("gen").desc, col("seq").desc, col("vc").desc)
    val merged = unioned
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")

    val dataDir = s"$base/data/v$next"
    merged.drop("gen").write.mode("overwrite").partitionBy("part").parquet(dataDir)

    // new manifest: touched partitions point at this commit's dirs,
    // untouched ones inherit (physical sharing between snapshots)
    val f = fs(spark, base)
    val written = f.listStatus(new Path(dataDir)).map(_.getPath.getName)
      .filter(_.startsWith("part="))
      .map(n => java.net.URLDecoder.decode(n.stripPrefix("part="), "UTF-8") -> s"$dataDir/$n")
      .toMap
    val manifest = prev ++ written
    val tmp = new Path(s"$base/_versions/.v$next.tmp")
    f.mkdirs(new Path(s"$base/_versions"))
    val out = f.create(tmp, true)
    try out.write(manifest.toSeq.sorted.map { case (p, d) => s"$p\t$d" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // rename IS the commit point: readers either see v<next> complete
    // or not at all
    require(f.rename(tmp, manifestPath(base, next)), s"commit of v$next lost a race")
    next
  }

  /** Delete by key predicate as a new version: the touched partitions
    * are rewritten WITHOUT the matching rows (no tombstones to merge
    * on read), untouched partitions inherit. Prior snapshots still see
    * the deleted rows — that is the point of versioning. A partition
    * whose rows all die drops out of the new manifest entirely (parquet
    * writes no dir for zero rows), exactly like a never-written one.
    */
  def delete(spark: SparkSession, base: String, parts: Seq[String],
      keyPred: org.apache.spark.sql.Column): Int = {
    val v = currentVersion(spark, base)
    require(v > 0, "cannot delete from an empty store")
    val next = v + 1
    val prev = readManifest(spark, base, v)
    val touched = parts.flatMap(p => prev.get(p).map(p -> _))
    val survivors = touched.map { case (p, dir) =>
      spark.read.parquet(dir).withColumn("part", lit(p))
    }.reduceOption(_ unionByName _)
      .map(_.where(!keyPred).select("key", "part", "seq", "vc"))
    val dataDir = s"$base/data/v$next"
    survivors.foreach(_.write.mode("overwrite").partitionBy("part").parquet(dataDir))

    val f = fs(spark, base)
    val written =
      if (survivors.isEmpty) Map.empty[String, String]
      else f.listStatus(new Path(dataDir)).map(_.getPath.getName)
        .filter(_.startsWith("part="))
        .map(n => java.net.URLDecoder.decode(n.stripPrefix("part="), "UTF-8") -> s"$dataDir/$n")
        .toMap
    // fully-deleted partitions drop out of the manifest entirely
    val manifest = (prev -- touched.map(_._1)) ++ written
    val tmp = new Path(s"$base/_versions/.v$next.tmp")
    val out = f.create(tmp, true)
    try out.write(manifest.toSeq.sorted.map { case (p, d) => s"$p\t$d" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(tmp, manifestPath(base, next)), s"commit of v$next lost a race")
    next
  }

  /** Snapshot read AS OF `version` — an immutable file set resolved
    * from that version's manifest; later commits never disturb it.
    */
  def readVersion(spark: SparkSession, base: String, version: Int): DataFrame = {
    val m = readManifest(spark, base, version)
    require(m.nonEmpty, s"version $version does not exist (or store is empty)")
    m.toSeq.sorted.map { case (part, dir) =>
      spark.read.parquet(dir).withColumn("part", lit(part))
    }.reduce(_ unionByName _)
      .select("key", "part", "seq", "vc")
  }
}
