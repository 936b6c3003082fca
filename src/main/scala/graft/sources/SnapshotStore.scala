package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Versioned parquet store with snapshot isolation and time travel —
  * the lakehouse commit protocol (Delta/Iceberg's core idea) reduced
  * to its essentials on plain parquet + a manifest-per-version:
  *
  *  - data lives in immutable per-attempt partition directories
  *    (`data/v<N>-<token>/<part>=...`); a commit never rewrites a
  *    prior version's files, and the attempt token means a LOSING
  *    concurrent committer can never clobber the winner's data either
  *    — each attempt writes only under its own directory, and the
  *    loser's orphan is removed on failure (or by `vacuum`)
  *  - each version is a MANIFEST (`_versions/v<N>.manifest`) mapping
  *    partition value -> the directory that holds that partition's
  *    rows AS OF the version; unchanged partitions carry the previous
  *    manifest's entry forward, so a commit costs O(touched
  *    partitions) storage and the untouched ones are physically SHARED
  *    between snapshots
  *  - commits are atomic via write-temp + rename of the manifest (the
  *    single mutation readers resolve); a reader of version N sees an
  *    immutable file set no later commit can disturb
  *  - `vacuum(keep)` bounds storage: it drops all but the newest
  *    `keep` manifests and deletes every partition directory no
  *    surviving manifest references — shared directories survive for
  *    as long as ANY retained snapshot needs them. (The reference's
  *    append-only file grows forever — SURVEY §4.2/§4.4 flag that as
  *    the anti-feature not to replicate.)
  *
  * At 100 TB this is the difference between "reproduce last week's
  * training run" being a free manifest read vs impossible: time travel
  * is just `readVersion(v)`, and concurrent readers never block
  * writers. Rows carry (key STRING, part STRING, seq LONG, vc LONG);
  * upsert semantics are last-writer-wins per (key, part) with higher
  * `seq` winning inside a batch — resolved distributed, one shuffle
  * over the touched partitions only.
  *
  * ==Concurrency contract==
  *
  * Readers are always safe: every published version is an immutable
  * file set. Writers serialize on the MANIFEST CAS in [[publish]] —
  * exactly one attempt can create `v<N>.manifest`, the loser removes
  * its private attempt directory and throws [[CommitRaceException]]
  * (SnapshotSpec pins the loser's cleanup). The CAS is only as atomic
  * as the filesystem's create-if-absent rename: HDFS rename refuses an
  * existing destination, but POSIX rename OVERWRITES one, so the
  * local-FS `exists || !rename` check narrows the race without closing
  * it. A rename-atomic FS or an external lock/catalog (the role a
  * Delta LogStore or an Iceberg catalog plays) makes the CAS exact.
  *
  * ==Multi-writer retry (round 12) — the conflict matrix==
  *
  * On top of the CAS, the `*WithRetry` entry points give a LOSING
  * committer optimistic rebase-and-retry (the Delta/Iceberg recovery
  * shape): re-read the head, re-validate, re-commit, bounded attempts.
  * Which races rebase and which abort follows from whether the op's
  * semantics embed a READ of the snapshot it was computed against:
  *
  *  - [[commitWithRetry]] (blind LWW upsert): REBASES on ANY overlap,
  *    including same-partition and same-key writes. The retry re-runs
  *    the whole merge against the new head, and because an incoming
  *    batch beats existing rows in the LWW window (`gen` desc), the
  *    result is exactly the serial history "loser applied after
  *    winner" — serializable by construction.
  *  - [[deleteRowsDvWithRetry]] (blind DV union): REBASES on any
  *    overlap — set union commutes, so re-unioning the keys into the
  *    new head's DV is again the loser-after-winner serial history.
  *  - [[mergeWithRetry]] (read-dependent MERGE): rebases ONLY when the
  *    winners' touched entries (manifest diff between the loser's base
  *    and the new head, INCLUDING the deletion-vector slot) are
  *    DISJOINT from the merge's own touched partitions — the re-run
  *    then re-reads partitions nobody changed and reproduces the same
  *    decisions. On OVERLAP it aborts with
  *    `ConcurrentModificationException`: the caller's `source` frame
  *    may embed a stale read of the store (read-modify-write), and
  *    silently re-applying it against changed rows could double-apply
  *    updates or resurrect deleted keys. The caller must re-derive the
  *    source from the new head and retry — the same contract Delta
  *    gives a conflicting MERGE. The validation approximates the
  *    merge's READ set by its write set (source partitions + DV slot),
  *    which is exact only when the source's reads of the store are
  *    confined to its own target partitions; a source derived from
  *    reading OTHER partitions (e.g. a lookup join against a pinned
  *    `readVersion`) must pass those via `readPartitions`, which is
  *    unioned into the conflict check — the Delta read-predicate
  *    analog. The source must also be deterministic with a fixed
  *    partition set across attempts (its touched set is recomputed per
  *    attempt, so a head-reading source is validated against what it
  *    would write NOW, but its decisions should not drift mid-loop).
  *
  * All reruns recompute from scratch (no attempt-dir reuse): the data
  * written by a lost attempt is already deleted by [[publish]], and at
  * commit sizes worth optimizing a rename-atomic FS + kept-files
  * rebase is the production path anyway.
  *
  * Driver-side footprint: commit/merge/delete collect only PARTITION
  * VALUES and per-partition stats — O(touched partitions) strings,
  * never rows. A store with millions of rows per partition costs the
  * driver the same as an empty one; what must stay bounded is the
  * partition-value cardinality itself, the same contract Hive-style
  * partitioning already imposes on any metastore.
  */
object SnapshotStore {

  /** Thrown by [[publish]] when another committer won the version —
    * subclasses IllegalStateException so pre-retry callers' handling
    * is unchanged; the `*WithRetry` loops catch exactly this type
    * (never a broader failure like a bad write).
    */
  final class CommitRaceException(msg: String) extends IllegalStateException(msg)

  /** Manifest key for a version's DELETION-VECTOR sidecar (see
    * [[deleteRowsDv]]). The NUL prefix keeps it out of the partition-
    * value namespace: partition values come from data and could
    * collide with any printable sentinel, but a NUL inside a real
    * partition value would have to survive Hive path escaping AND be
    * deliberate — documented as unsupported.
    */
  private[sources] val DvKey = "\u0000dv"

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(base: String, v: Int) =
    new Path(s"$base/_versions/v$v.manifest")

  private def statsPath(base: String, v: Int) =
    new Path(s"$base/_versions/v$v.stats")

  /** Partition-dir name -> partition value. Spark writes Hive-style
    * escaping (`a/b` -> `a%2Fb`); java.net.URLDecoder is NOT its
    * inverse (it turns '+' into a space, which escapePathName never
    * produces), so decode with the catalog's own unescape.
    */
  private def partValue(dirName: String): String =
    ExternalCatalogUtils.unescapePathName(dirName.stripPrefix("part="))

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

  /** List this attempt's written partition dirs as (part value -> dir). */
  private def writtenParts(spark: SparkSession, base: String, dataDir: String): Map[String, String] =
    fs(spark, base).listStatus(new Path(dataDir)).map(_.getPath.getName)
      .filter(_.startsWith("part="))
      .map(n => partValue(n) -> s"$dataDir/$n")
      .toMap

  /** Publish `manifest` as version `next`, or clean up this attempt's
    * private data dir and fail if another committer won the version.
    * The attempt token in `dataDir` is what makes the cleanup safe:
    * the loser deletes only files no published manifest can reference.
    */
  private[sources] def publish(spark: SparkSession, base: String, next: Int,
      manifest: Map[String, String], dataDir: String): Unit = {
    val f = fs(spark, base)
    val tmp = new Path(s"$base/_versions/.v$next.${new Path(dataDir).getName}.tmp")
    f.mkdirs(new Path(s"$base/_versions"))
    val out = f.create(tmp, true)
    try out.write(manifest.toSeq.sorted.map { case (p, d) => s"$p\t$d" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // rename IS the commit point: readers either see v<next> complete
    // or not at all; rename-onto-existing fails, so exactly one
    // attempt publishes each version
    if (f.exists(manifestPath(base, next)) || !f.rename(tmp, manifestPath(base, next))) {
      f.delete(tmp, false)
      f.delete(new Path(dataDir), true)
      throw new CommitRaceException(
        s"commit of v$next lost a race; this attempt's data was removed")
    }
  }

  /** Manifest entries (partitions + the DV slot) whose pointer changed
    * between two committed versions — exactly the union of the
    * intervening commits' touched sets, read from metadata alone.
    */
  private[sources] def touchedBetween(
      spark: SparkSession, base: String, fromV: Int, toV: Int): Set[String] = {
    val a = readManifest(spark, base, fromV)
    val b = readManifest(spark, base, toV)
    (a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))
  }

  private def attemptDir(base: String, next: Int): String =
    s"$base/data/v$next-${java.util.UUID.randomUUID.toString.take(8)}"

  /** Commit `batch` as the next version: last-write-wins upsert against
    * the current snapshot, touching only the partitions present in the
    * batch. Requires the (key, part, seq, vc) core columns; any EXTRA
    * value columns evolve the schema — old rows read them as NULL and
    * no historical dir is rewritten. Returns the new version.
    */
  def commit(spark: SparkSession, base: String, batch: DataFrame): Int =
    commit(spark, base, batch, () => ())

  /** Test seam: `beforePublish` runs between the attempt's data write
    * and the manifest CAS — the window a concurrent winner lands in.
    * SnapshotSpec injects a racing commit there to replay the
    * multi-writer race deterministically.
    */
  private[sources] def commit(spark: SparkSession, base: String,
      batch: DataFrame, beforePublish: () => Unit): Int = {
    val v = currentVersion(spark, base)
    val next = v + 1
    val prev = readManifest(spark, base, v)
    val touched = batch.select("part").distinct().collect().map(_.getString(0))

    // merge incoming rows with the touched partitions' current rows;
    // win = max (gen, seq) per (key, part) — deterministic. Partition
    // dirs store only (key, seq, vc) — partitionBy moved `part` into
    // the directory name — so re-attach it per dir like readVersion.
    val existingParts = touched.toSeq.flatMap(p => prev.get(p).map(p -> _))
    // schema EVOLUTION: the batch may carry value columns beyond the
    // (key, part, seq, vc) core — they land in this commit's dirs, old
    // rows surface them as NULL (and dirs from older commits are never
    // rewritten, so evolution costs nothing at any store size)
    val core = Seq("key", "part", "seq", "vc")
    require(core.forall(batch.columns.contains),
      s"batch must carry ${core.mkString("/")}, has ${batch.columns.mkString(",")}")
    val incoming = batch.withColumn("gen", lit(1))
    val unioned =
      if (existingParts.isEmpty) incoming
      else incoming.unionByName(
        existingParts.map { case (p, dir) =>
          spark.read.parquet(dir).withColumn("part", lit(p))
        }.reduce(_.unionByName(_, allowMissingColumns = true))
          .withColumn("gen", lit(0)),
        allowMissingColumns = true)
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

    val dataDir = attemptDir(base, next)
    merged.drop("gen").write.mode("overwrite").partitionBy("part").parquet(dataDir)

    // new manifest: touched partitions point at this attempt's dirs,
    // untouched ones inherit (physical sharing between snapshots)
    val manifest0 = prev ++ writtenParts(spark, base, dataDir)
    // a deletion vector (deleteRowsDv) carries forward — EXCEPT for
    // keys this batch re-inserts: their new physical row must surface,
    // so they leave the DV (DVs are small; the rewrite is one tiny file)
    val manifest = prev.get(DvKey) match {
      case None => manifest0
      case Some(oldDv) =>
        val remaining = spark.read.parquet(oldDv)
          .join(batch.select("key", "part").distinct(),
            Seq("key", "part"), "left_anti")
        if (remaining.isEmpty) manifest0 - DvKey
        else {
          val dvDir = s"$dataDir-dv"
          remaining.coalesce(1).write.mode("overwrite").parquet(dvDir)
          manifest0 + (DvKey -> dvDir)
        }
    }
    beforePublish()
    publish(spark, base, next, manifest, dataDir)
    // ZONE MAP upkeep (optional metadata — see readVersionVcRange):
    // touched partitions get fresh (min vc, max vc) from the merged
    // frame; untouched ones inherit. Written only AFTER a successful
    // publish, so a losing committer never plants stats for a version
    // it did not write; a crash in between just loses the skip index
    // for this version (reads stay correct, only less prunable).
    val touchedStats = merged.where(col("vc").isNotNull).groupBy("part")
      .agg(min("vc").as("mn"), max("vc").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    writeStats(spark, base, next,
      (readStats(spark, base, v) -- touchedStats.keys) ++ touchedStats)
    next
  }

  /** Per-partition (min vc, max vc) zone map of a version — Iceberg/
    * Delta-style file-skipping stats reduced to the store's manifest
    * model. OPTIONAL metadata: a missing file (or missing entry)
    * means "cannot skip, must read", never an error — so only
    * [[commit]] maintains it, and rewriting operations (delete,
    * merge, compact) simply leave the rewritten version unindexed
    * until the next commit touches it.
    */
  private[sources] def readStats(spark: SparkSession, base: String, v: Int)
      : Map[String, (Long, Long)] = {
    val f = fs(spark, base)
    if (v == 0 || !f.exists(statsPath(base, v))) Map.empty
    else {
      val in = f.open(statsPath(base, v))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      txt.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(part, mn, mx) = line.split("\t", 3)
        part -> (mn.toLong, mx.toLong)
      }.toMap
    }
  }

  private def writeStats(spark: SparkSession, base: String, v: Int,
      stats: Map[String, (Long, Long)]): Unit = {
    val f = fs(spark, base)
    val tmp = new Path(s"$base/_versions/.v$v.stats.tmp")
    val out = f.create(tmp, true)
    try out.write(stats.toSeq.sorted.map { case (p, (mn, mx)) => s"$p\t$mn\t$mx" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // only-if-absent: in a commit race the winner's stats stand
    if (!f.rename(tmp, statsPath(base, v))) f.delete(tmp, false)
  }

  /** Snapshot read pruned by the ZONE MAP: partitions whose stored
    * [min vc, max vc] band cannot intersect `[lo, hi]` never reach
    * the scan — manifest-level data skipping, the pattern that turns
    * a value-range query on a time-correlated 100 TB store into a
    * few-partition read. Partitions WITHOUT stats are conservatively
    * read; the residual row filter applies either way, so the result
    * is always exactly the range — skipping only changes I/O.
    */
  def readVersionVcRange(spark: SparkSession, base: String, version: Int,
      lo: Long, hi: Long): DataFrame = {
    val stats = readStats(spark, base, version)
    readVersionWhere(spark, base, version, p => stats.get(p) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None           => true
    }).where(col("vc") >= lo && col("vc") <= hi)
  }

  /** Delete by key predicate as a new version: the touched partitions
    * are rewritten WITHOUT the matching rows (no tombstones to merge
    * on read), untouched partitions inherit. SQL DELETE semantics: a
    * row dies only where the predicate is definitively TRUE — a
    * NULL-valued predicate keeps the row (filtering survivors with a
    * bare `!pred` would silently delete every NULL-predicate row).
    * Prior snapshots still see the deleted rows — that is the point
    * of versioning. A partition whose rows all die drops out of the
    * new manifest entirely (parquet writes no dir for zero rows),
    * exactly like a never-written one.
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
    }.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .map(_.where(!coalesce(keyPred, lit(false)))) // evolved columns survive rewrites
    val dataDir = attemptDir(base, next)
    survivors.foreach(_.write.mode("overwrite").partitionBy("part").parquet(dataDir))

    val written =
      if (survivors.isEmpty) Map.empty[String, String]
      else writtenParts(spark, base, dataDir)
    // fully-deleted partitions drop out of the manifest entirely
    val manifest = (prev -- touched.map(_._1)) ++ written
    publish(spark, base, next, manifest, dataDir)
    next
  }

  /** ROW-LEVEL DELETE WITHOUT REWRITING DATA — deletion vectors, the
    * lakehouse answer to "delete 10 rows from a 1 GB file" (Delta DVs /
    * Iceberg positional deletes). [[delete]] rewrites every touched
    * partition; at 100 TB a GDPR-style scattered key delete would
    * rewrite the whole store. This commits a new version whose data
    * dirs are UNCHANGED and whose manifest adds a tiny (key, part)
    * sidecar; readers anti-join it (a broadcast — DVs are deletes, not
    * data). The sidecar is cumulative per version, so a read applies
    * exactly one DV regardless of delete history.
    *
    * Lifecycle: [[commit]] of a batch re-inserting a deleted key
    * CLEARS that key from the DV (the new physical row must surface);
    * [[compact]] materializes deletes and drops the DV; [[vacuum]]
    * keeps referenced DV dirs and sweeps unreferenced ones; time
    * travel to a pre-delete version sees the rows (its manifest has no
    * — or an older — DV). [[merge]] keeps its own partition-rewrite
    * delete semantics; composing merge-insert with a DV'd key is
    * unsupported (the DV wins until a commit() clears it).
    */
  def deleteRowsDv(spark: SparkSession, base: String, keys: DataFrame): Int =
    deleteRowsDv(spark, base, keys, () => ())

  /** Test seam — see [[commit]]'s hooked overload. */
  private[sources] def deleteRowsDv(spark: SparkSession, base: String,
      keys: DataFrame, beforePublish: () => Unit): Int = {
    val v = currentVersion(spark, base)
    require(v > 0, "cannot delete from an empty store")
    require(Seq("key", "part").forall(keys.columns.contains),
      s"DV keys need (key, part), got ${keys.columns.mkString(",")}")
    val next = v + 1
    val prev = readManifest(spark, base, v)
    val add = keys.select("key", "part")
    val newDv = prev.get(DvKey) match {
      case Some(old) => spark.read.parquet(old).unionByName(add).distinct()
      case None      => add.distinct()
    }
    val dvDir = s"${attemptDir(base, next)}-dv"
    newDv.coalesce(1).write.mode("overwrite").parquet(dvDir)
    beforePublish()
    publish(spark, base, next, prev + (DvKey -> dvDir), dvDir)
    next
  }

  /** MERGE `source` (key, part, seq, vc) into the current snapshot as
    * a new version — Delta-style MERGE reduced to the store's row
    * model. Rows match on (key, part). A matched row is deleted when
    * `matchedDelete` is definitively TRUE, otherwise updated to
    * `matchedUpdateVc` (its seq advances to the larger side so LWW
    * stays monotonic); unmatched source rows insert as-is; unmatched
    * target rows carry forward. Both expressions may reference the
    * sides as `t.<col>` / `s.<col>`.
    *
    * Scale shape: only the partitions PRESENT in the source are read
    * and rewritten — one shuffle (the full-outer merge join) over the
    * touched partitions; untouched partitions inherit physically via
    * the manifest. A touched partition whose rows all die drops out of
    * the manifest like a never-written one.
    */
  def merge(spark: SparkSession, base: String, source: DataFrame,
      matchedDelete: org.apache.spark.sql.Column,
      matchedUpdateVc: org.apache.spark.sql.Column): Int =
    merge(spark, base, source, matchedDelete, matchedUpdateVc, () => ())

  /** Test seam — see [[commit]]'s hooked overload. */
  private[sources] def merge(spark: SparkSession, base: String, source: DataFrame,
      matchedDelete: org.apache.spark.sql.Column,
      matchedUpdateVc: org.apache.spark.sql.Column,
      beforePublish: () => Unit): Int = {
    val v = currentVersion(spark, base)
    val next = v + 1
    val prev = readManifest(spark, base, v)
    val touched = source.select("part").distinct().collect().map(_.getString(0))
    val existingParts = touched.toSeq.flatMap(p => prev.get(p).map(p -> _))
    val src = source.select("key", "part", "seq", "vc")
    val merged = existingParts.map { case (p, dir) =>
      spark.read.parquet(dir).withColumn("part", lit(p))
    }.reduceOption(_ unionByName _) match {
      case None => src // empty target: everything inserts
      case Some(t) =>
        val joined = t.select("key", "part", "seq", "vc").alias("t")
          .join(src.alias("s"),
            col("t.key") === col("s.key") && col("t.part") === col("s.part"),
            "full_outer")
        val matched = col("t.key").isNotNull && col("s.key").isNotNull
        joined
          // delete only where matched AND the clause is definitively true
          .where(!(matched && (matchedDelete <=> lit(true))))
          .select(
            coalesce(col("t.key"), col("s.key")).as("key"),
            coalesce(col("t.part"), col("s.part")).as("part"),
            when(col("t.key").isNull, col("s.seq"))
              .when(col("s.key").isNull, col("t.seq"))
              .otherwise(greatest(col("t.seq"), col("s.seq"))).as("seq"),
            when(col("t.key").isNull, col("s.vc"))   // insert
              .when(col("s.key").isNull, col("t.vc")) // carry forward
              .otherwise(matchedUpdateVc).as("vc"))   // update
    }
    val dataDir = attemptDir(base, next)
    merged.write.mode("overwrite").partitionBy("part").parquet(dataDir)
    val manifest = (prev -- touched) ++ writtenParts(spark, base, dataDir)
    beforePublish()
    publish(spark, base, next, manifest, dataDir)
    next
  }

  /** [[commit]] with optimistic rebase-and-retry (conflict matrix in
    * the object scaladoc): a blind LWW upsert rebases on ANY race by
    * recomputing against the new head — the retry IS the serial
    * history "loser after winner". Throws the last race loss after
    * `maxAttempts` (contention beyond that needs an external
    * lock/catalog, not more spinning).
    */
  def commitWithRetry(spark: SparkSession, base: String, batch: DataFrame,
      maxAttempts: Int = 5): Int =
    commitWithRetry(spark, base, batch, maxAttempts, () => ())

  private[sources] def commitWithRetry(spark: SparkSession, base: String,
      batch: DataFrame, maxAttempts: Int, beforePublish: () => Unit): Int = {
    var last: CommitRaceException = null
    (1 to maxAttempts).foreach { attempt =>
      try return commit(spark, base, batch,
        if (attempt == 1) beforePublish else () => ())
      catch { case e: CommitRaceException => last = e }
    }
    throw new IllegalStateException(
      s"commit on $base lost $maxAttempts version races; giving up", last)
  }

  /** [[deleteRowsDv]] with rebase-and-retry: DV union commutes, so the
    * rerun against the new head's DV is always the serializable
    * loser-after-winner history.
    */
  def deleteRowsDvWithRetry(spark: SparkSession, base: String, keys: DataFrame,
      maxAttempts: Int = 5): Int =
    deleteRowsDvWithRetry(spark, base, keys, maxAttempts, () => ())

  private[sources] def deleteRowsDvWithRetry(spark: SparkSession, base: String,
      keys: DataFrame, maxAttempts: Int, beforePublish: () => Unit): Int = {
    var last: CommitRaceException = null
    (1 to maxAttempts).foreach { attempt =>
      try return deleteRowsDv(spark, base, keys,
        if (attempt == 1) beforePublish else () => ())
      catch { case e: CommitRaceException => last = e }
    }
    throw new IllegalStateException(
      s"deleteRowsDv on $base lost $maxAttempts version races; giving up", last)
  }

  /** [[merge]] with VALIDATED rebase-and-retry: after a race loss the
    * winners' touched entries come from the manifest diff between this
    * attempt's base and the new head (metadata only). Disjoint from
    * the merge's own partitions (and the DV slot unchanged) → re-run;
    * any overlap → `ConcurrentModificationException`, because the
    * caller's source may embed a stale read of exactly those rows
    * (see the conflict matrix). The base is re-read per attempt, so
    * validation is against everything published since the LAST try —
    * conservative if a commit lands between the version read and the
    * merge body (it would abort a race the merge actually saw), never
    * permissive.
    */
  def mergeWithRetry(spark: SparkSession, base: String, source: DataFrame,
      matchedDelete: org.apache.spark.sql.Column,
      matchedUpdateVc: org.apache.spark.sql.Column,
      maxAttempts: Int = 5,
      readPartitions: Set[String] = Set.empty): Int =
    mergeWithRetry(spark, base, source, matchedDelete, matchedUpdateVc,
      maxAttempts, () => (), readPartitions)

  private[sources] def mergeWithRetry(spark: SparkSession, base: String,
      source: DataFrame, matchedDelete: org.apache.spark.sql.Column,
      matchedUpdateVc: org.apache.spark.sql.Column, maxAttempts: Int,
      beforePublish: () => Unit): Int =
    mergeWithRetry(spark, base, source, matchedDelete, matchedUpdateVc,
      maxAttempts, beforePublish, Set.empty)

  private[sources] def mergeWithRetry(spark: SparkSession, base: String,
      source: DataFrame, matchedDelete: org.apache.spark.sql.Column,
      matchedUpdateVc: org.apache.spark.sql.Column, maxAttempts: Int,
      beforePublish: () => Unit, readPartitions: Set[String]): Int = {
    var last: CommitRaceException = null
    (1 to maxAttempts).foreach { attempt =>
      val baseV = currentVersion(spark, base)
      try return merge(spark, base, source, matchedDelete, matchedUpdateVc,
        if (attempt == 1) beforePublish else () => ())
      catch {
        case e: CommitRaceException =>
          last = e
          // the touched set is recomputed PER ATTEMPT: source is lazy,
          // so a head-reading source's partitions can differ between
          // tries — validating a stale set would misclassify a
          // conflict as disjoint (scaladoc determinism caveat)
          val myTouched = source.select("part").distinct()
            .collect().map(_.getString(0)).toSet ++ readPartitions + DvKey
          val headV = currentVersion(spark, base)
          val overlap = touchedBetween(spark, base, baseV, headV)
            .intersect(myTouched)
          if (overlap.nonEmpty) {
            val shown = overlap.map(k => if (k == DvKey) "<deletion-vector>" else k)
            throw new java.util.ConcurrentModificationException(
              s"merge on $base conflicts with concurrent commit(s) " +
                s"v${baseV + 1}..v$headV on: ${shown.toSeq.sorted.mkString(", ")} — " +
                "re-derive the source from the new head and retry")
          }
      }
    }
    throw new IllegalStateException(
      s"merge on $base lost $maxAttempts non-conflicting races; giving up", last)
  }

  /** Change data feed between two committed versions: a row-level diff
    * classified as insert / delete / update_preimage / update_postimage
    * (Delta CDF's queryable core). The partition set to diff comes from
    * the MANIFESTS — a partition whose directory pointer is unchanged
    * is skipped without reading a row, so physical sharing doubles as a
    * free change index: the cost is O(changed partitions), not O(store).
    */
  def changes(spark: SparkSession, base: String, fromV: Int, toV: Int): DataFrame =
    changes(spark, base, fromV, toV, withValues = false)

  /** With `withValues = true` the feed carries every evolved value
    * column alongside the (seq, vc) core — preimage/delete rows hold
    * the `fromV` values, postimage/insert rows the `toV` values, and a
    * column a side's schema predates reads NULL (same contract as a
    * snapshot read). This is the Delta-CDF production shape: downstream
    * incremental pipelines (SCD2 builds, join-view maintenance) consume
    * the feed alone and never re-read the full table. Cost is unchanged
    * — O(changed partitions) via the manifest diff.
    */
  def changes(spark: SparkSession, base: String, fromV: Int, toV: Int,
              withValues: Boolean): DataFrame = {
    require(fromV >= 1 && toV > fromV, s"need 1 <= fromV < toV, got $fromV..$toV")
    val ma = readManifest(spark, base, fromV)
    val mb = readManifest(spark, base, toV)
    require(ma.nonEmpty && mb.nonEmpty, s"versions $fromV and $toV must both exist")
    // a changed DV sidecar can delete rows in ANY partition, so the
    // manifest-diff shortcut widens to every partition for that span —
    // the documented DV trade-off (compaction rematerializes and
    // restores O(changed-partition) diffs)
    val maD = ma - DvKey
    val mbD = mb - DvKey
    val changed =
      if (ma.get(DvKey) != mb.get(DvKey)) maD.keySet ++ mbD.keySet
      else (maD.keySet ++ mbD.keySet).filter(p => maD.get(p) != mbD.get(p))
    val core = Seq("key", "part", "seq", "vc")
    // schema evolution: align both sides on the UNION of value columns
    // (NULL where a side's schema predates the column), exactly like a
    // mergeSchema snapshot read
    def aligned(df: DataFrame, allExtras: Seq[(String, org.apache.spark.sql.types.DataType)]) =
      df.select(core.map(col) ++ allExtras.map { case (c, t) =>
        (if (df.columns.contains(c)) col(c) else lit(null).cast(t)).as(c)
      }: _*)
    val before0 = readVersionWhere(spark, base, fromV, changed.contains)
    val after0 = readVersionWhere(spark, base, toV, changed.contains)
    val extras: Seq[(String, org.apache.spark.sql.types.DataType)] =
      if (!withValues) Seq.empty
      else (before0.schema ++ after0.schema)
        .filterNot(f => core.contains(f.name))
        .map(f => f.name -> f.dataType).distinct.sortBy(_._1)
    val before = aligned(before0, extras)
    val after = aligned(after0, extras)
    val j = before.alias("t").join(after.alias("s"),
      col("t.key") === col("s.key") && col("t.part") === col("s.part"), "full_outer")
    def img(tag: String, side: String) = struct(
      lit(tag).as("change_type") +: col(s"$side.seq").as("seq") +:
        col(s"$side.vc").as("vc") +:
        extras.map { case (c, _) => col(s"$side.$c").as(c) }: _*)
    val pre = img("update_preimage", "t")
    val post = img("update_postimage", "s")
    val ins = img("insert", "s")
    val del = img("delete", "t")
    // rewritten-but-identical rows are not changes — drop them first so
    // every surviving row maps to a non-empty change array. (seq, vc)
    // identity is sufficient even withValues: commit's LWW only lets a
    // row's values change under a strictly higher (gen, seq, vc), so
    // equal keys never carry silently different values.
    j.where(!(col("t.key").isNotNull && col("s.key").isNotNull &&
        col("t.seq") === col("s.seq") && col("t.vc") === col("s.vc")))
      .select(
        coalesce(col("t.key"), col("s.key")).as("key"),
        coalesce(col("t.part"), col("s.part")).as("part"),
        explode(
          when(col("t.key").isNull, array(ins))
            .when(col("s.key").isNull, array(del))
            .otherwise(array(pre, post))).as("c"))
      .select(col("key") +: col("part") +: col("c.change_type").as("change_type") +:
        col("c.seq").as("seq") +: col("c.vc").as("vc") +:
        extras.map { case (c, _) => col(s"c.$c").as(c) }: _*)
  }

  /** Compaction (OPTIMIZE): rewrite the current snapshot into one file
    * per partition as a new content-identical version. Prior versions
    * are untouched (vacuum reclaims their files once they age out).
    * The small-files problem is the operational killer of frequent
    * ingest at scale — a store committing every 5 minutes accumulates
    * hundreds of files per partition per day until reads spend longer
    * opening footers than scanning rows; compaction resets that to one.
    */
  def compact(spark: SparkSession, base: String): Int = {
    val v = currentVersion(spark, base)
    require(v > 0, "cannot compact an empty store")
    val next = v + 1
    val cur = readVersion(spark, base, v)
    val dataDir = attemptDir(base, next)
    // repartition by part: each partition's rows land in one task, so
    // partitionBy writes exactly one file per partition directory
    cur.repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(dataDir)
    publish(spark, base, next, writtenParts(spark, base, dataDir), dataDir)
    next
  }

  /** Snapshot read AS OF `version` — an immutable file set resolved
    * from that version's manifest; later commits never disturb it.
    * ONE multi-path parquet scan regardless of partition count (a
    * per-dir union would put thousands of scan nodes in the plan at
    * scale); the partition value rides back in via the file path:
    * `input_file_name()` renders the Hadoop URI-encoded path, so the
    * driver-side lookup keys on `new Path(dir).toUri.getRawPath`'s
    * last segment — byte-identical to what the executor sees, for
    * any partition value (slash, space, '+', '%', ... pinned in
    * SnapshotSpec).
    */
  def readVersion(spark: SparkSession, base: String, version: Int): DataFrame =
    readVersionWhere(spark, base, version, _ => true)

  /** Snapshot read restricted to the partitions `partFilter` accepts —
    * partition pruning at the MANIFEST level: rejected partitions'
    * directories never reach the scan at all (the part value is only
    * re-attached after the read, so a post-hoc `.where` on it could
    * not prune; this is the scale path for day-ranged time travel).
    */
  def readVersionWhere(spark: SparkSession, base: String, version: Int,
      partFilter: String => Boolean): DataFrame = {
    val m0 = readManifest(spark, base, version)
    require(m0.nonEmpty, s"version $version does not exist (or store is empty)")
    // the DV sidecar is metadata, not a partition — strip it from the
    // scan set, apply it as a broadcast anti-join at the end
    val dvDir = m0.get(DvKey)
    val m = m0 - DvKey
    def applyDv(df: DataFrame): DataFrame = dvDir.fold(df)(dd =>
      df.join(broadcast(spark.read.parquet(dd)), Seq("key", "part"), "left_anti"))
    import spark.implicits._
    val entries = m.toSeq.filter { case (p, _) => partFilter(p) }.sorted
    if (entries.isEmpty)
      return Seq.empty[(String, String, Long, Long)].toDF("key", "part", "seq", "vc")
    val segToPart = entries.map { case (part, dir) =>
      new Path(dir).toUri.getRawPath.split('/').last -> part
    }
    // the internal dir-segment join column gets a reserved name so it
    // can never swallow a same-named user value column
    val segCol = "__graft_dir_seg"
    val lookup = segToPart.toDF(segCol, "part")
    // mergeSchema: snapshots may span commits with EVOLVED schemas —
    // dirs written before a column existed read it back as NULL. Core
    // columns lead, evolved ones follow in name order (deterministic
    // output schema regardless of which dirs this version references).
    val df = spark.read.option("mergeSchema", "true")
      .parquet(entries.map(_._2): _*)
      .withColumn(segCol,
        regexp_extract(input_file_name(), "/(part=[^/]+)/[^/]*$", 1))
      .join(broadcast(lookup), segCol)
    val core = Seq("key", "part", "seq", "vc")
    val extras = df.columns.filterNot(c => core.contains(c) || c == segCol).sorted
    applyDv(df.select((core ++ extras).map(col): _*))
  }

  private def clonesDir(base: String) = new Path(s"$base/_versions/_clones")

  /** Data dirs pinned by registered shallow clones of this store —
    * the union of every `_versions/_clones/<id>.clone` marker's dir
    * list, path-normalized like vacuum's reference set.
    */
  private[sources] def registeredCloneRefs(spark: SparkSession, base: String): Set[String] = {
    val f = fs(spark, base)
    val dir = clonesDir(base)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).filter(_.getPath.getName.endsWith(".clone"))
      .flatMap { st =>
        val in = f.open(st.getPath)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        txt.linesIterator.drop(1).filter(_.nonEmpty) // line 1 = clone base
      }.map(d => new Path(d).toUri.getPath).toSet
  }

  /** SHALLOW CLONE: start a new store at `cloneBase` whose v1 manifest
    * points at the SOURCE's current data dirs — zero rows copied, so a
    * clone of a 100 TB store costs one manifest write. The clone then
    * evolves independently: its own commits write under its own base,
    * never rewriting shared dirs (dirs are immutable), and vacuuming
    * the clone sweeps only the clone's data root.
    *
    * The lifecycle hazard Delta shallow clones carry — vacuuming the
    * SOURCE deletes dirs a clone still references — is closed here
    * because we own both stores' metadata: the clone registers the
    * dirs it borrows in the source's `_versions/_clones/` BEFORE its
    * manifest publishes (crash between the two steps leaves only a
    * harmless over-retaining marker), and the source's `vacuum`
    * excludes registered dirs unless called with `force = true`.
    * `dropCloneRegistration` releases the pin when a clone is retired.
    */
  def shallowClone(spark: SparkSession, base: String, cloneBase: String): Int = {
    val v = currentVersion(spark, base)
    require(v > 0, s"cannot clone empty store $base")
    require(currentVersion(spark, cloneBase) == 0, s"clone target $cloneBase not empty")
    val m = readManifest(spark, base, v)
    val f = fs(spark, base)
    f.mkdirs(clonesDir(base))
    val marker = new Path(clonesDir(base),
      s"${java.util.UUID.randomUUID.toString.take(8)}.clone")
    val out = f.create(marker, true)
    try out.write((cloneBase +: m.values.toSeq.sorted).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // no data is written for a clone; the attempt dir exists only so a
    // lost publish race has something well-defined (and empty) to sweep
    try publish(spark, cloneBase, 1, m, attemptDir(cloneBase, 1))
    catch { case e: Throwable => f.delete(marker, false); throw e }
    1
  }

  /** Release a clone's pin on the source's data dirs (call when the
    * clone at `cloneBase` is deep-copied or deleted). Returns the
    * number of markers removed.
    */
  def dropCloneRegistration(spark: SparkSession, base: String, cloneBase: String): Int = {
    val f = fs(spark, base)
    val dir = clonesDir(base)
    if (!f.exists(dir)) return 0
    val mine = f.listStatus(dir).filter(_.getPath.getName.endsWith(".clone"))
      .filter { st =>
        val in = f.open(st.getPath)
        val first = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().nextOption().getOrElse("") finally in.close()
        first == cloneBase
      }
    mine.foreach(st => f.delete(st.getPath, false))
    mine.length
  }

  /** RESTORE (Delta's `RESTORE TABLE ... VERSION AS OF` analog): make
    * the table's next version identical to historical version `toV` —
    * a manifest-only commit pointing at toV's directories, no byte of
    * data copied or rewritten at any table size. History is preserved:
    * the rolled-over versions stay readable until vacuumed, and the
    * restore is itself just another version (so a restore can be
    * restored, and `changes` across it reports the rollback's diff).
    */
  def restore(spark: SparkSession, base: String, toV: Int): Int = {
    val cur = currentVersion(spark, base)
    require(toV >= 1 && toV <= cur, s"cannot restore to v$toV (store is at v$cur)")
    val m = readManifest(spark, base, toV)
    require(m.nonEmpty, s"version $toV no longer exists (vacuumed?)")
    val next = cur + 1
    // no data is written for a restore; the attempt dir exists only so
    // a lost publish race has something well-defined (empty) to sweep
    publish(spark, base, next, m, attemptDir(base, next))
    next
  }

  /** The commit log: (version, partition count) for every live
    * manifest, oldest first — a driver-side manifest listing, no data
    * read (Delta's DESCRIBE HISTORY reduced to its queryable core).
    */
  def history(spark: SparkSession, base: String): Seq[(Int, Int)] =
    (1 to currentVersion(spark, base)).flatMap { v =>
      val m = readManifest(spark, base, v)
      if (m.isEmpty) None else Some(v -> m.size)
    }

  /** Reclaim storage: keep the newest `keepVersions` manifests, delete
    * the older ones, then delete every partition directory under
    * `data/` that no SURVIVING manifest references (directories shared
    * with a retained snapshot survive — sharing is physical, so the
    * reference set is the union over kept manifests). Attempt dirs
    * left empty (including orphans from lost commit races) are
    * removed. After vacuum, `readVersion` of a dropped version fails
    * loudly with the usual missing-version error.
    *
    * Dirs pinned by REGISTERED shallow clones (see [[shallowClone]])
    * are excluded from the sweep unless `force = true` — a routine
    * source vacuum can no longer silently corrupt a clone; forcing is
    * the explicit "I know the clones are dead" override.
    */
  def vacuum(spark: SparkSession, base: String, keepVersions: Int,
      force: Boolean = false): Unit = {
    require(keepVersions >= 1, "must keep at least the current version")
    val f = fs(spark, base)
    val cur = currentVersion(spark, base)
    if (cur == 0) return
    val cutoff = cur - keepVersions + 1
    val kept = (cutoff to cur).filter(v => f.exists(manifestPath(base, v)))
    // normalize through Path so string-level slash quirks in `base`
    // can't make a referenced dir look unreferenced (and get deleted)
    val referenced = kept.flatMap(v => readManifest(spark, base, v).values)
      .map(d => new Path(d).toUri.getPath).toSet ++
      (if (force) Set.empty else registeredCloneRefs(spark, base))
    (1 until cutoff).foreach { v =>
      f.delete(manifestPath(base, v), false)
      f.delete(statsPath(base, v), false) // zone map dies with its manifest
    }
    val dataRoot = new Path(s"$base/data")
    if (!f.exists(dataRoot)) return
    f.listStatus(dataRoot).filter(_.isDirectory).foreach { attempt =>
      // deletion-vector sidecars are whole attempt-level dirs (no
      // part= children): referenced ones survive via the manifest
      // entry, unreferenced ones sweep as a unit
      if (attempt.getPath.getName.endsWith("-dv")) {
        if (!referenced.contains(attempt.getPath.toUri.getPath))
          f.delete(attempt.getPath, true)
      } else {
        f.listStatus(attempt.getPath)
          .filter(st => st.getPath.getName.startsWith("part="))
          .foreach { st =>
            if (!referenced.contains(st.getPath.toUri.getPath))
              f.delete(st.getPath, true)
          }
        val left = f.listStatus(attempt.getPath)
          .filterNot(_.getPath.getName.startsWith("_")) // writer metadata (_SUCCESS)
        if (left.isEmpty) f.delete(attempt.getPath, true)
      }
    }
  }
}
