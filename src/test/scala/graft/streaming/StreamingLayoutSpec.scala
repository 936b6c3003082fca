package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-layout robustness of the streaming gates' file sources.
  *
  * The driver testdata ships each table as ONE parquet file
  * (`documents.parquet` is a file); every Spark-written corpus —
  * ScaleGen slices, any production ingest — is a DIRECTORY of part
  * files under the same name. The gates' original source pattern
  * (`readStream.option("pathGlobFilter", "documents.parquet")
  * .parquet(dir)`) matched only the first layout: pathGlobFilter
  * applies to leaf FILE names, `part-*.parquet` never equals
  * `documents.parquet`, and the stream silently read ZERO files —
  * every gate row dropped, zero errors (found when the r15 gen-slice
  * stamp of streaming_dedup_gate drained 0 rows in 0.99 s). The fix
  * targets the table path itself, which the file source treats as a
  * glob, resolving both layouts. This spec pins the parity.
  */
class StreamingLayoutSpec extends SparkSpec {

  test("dedup gate drains identically from file-layout and directory-layout corpora") {
    val dirCorpus = java.nio.file.Files.createTempDirectory("dirlayout").toString
    // a directory-of-part-files copy of the same documents table
    graft.Tables.documents(spark, sf0001)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dirCorpus/documents.parquet")

    def drained(d: String): Seq[(String, Long, Long)] =
      StreamingOps.dedupGateOnce(spark, d)
        .select("source", "n_docs", "n_dropped").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    val fromFile = drained(sf0001)
    val fromDir = drained(dirCorpus)
    assert(fromFile.nonEmpty && fromFile.map(_._2).sum > 0,
      s"file-layout drain is vacuous: $fromFile")
    assert(fromDir == fromFile,
      s"directory-layout drain diverges:\n dir=$fromDir\n file=$fromFile")
  }

  test("ANN gate reads a directory-layout embeddings table (non-vacuous drain)") {
    val dirCorpus = java.nio.file.Files.createTempDirectory("dirlayout_emb").toString
    graft.Tables.embeddings(spark, sf0001)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dirCorpus/embeddings.parquet")
    // the ANN gate builds its index from the same dir's embeddings and
    // streams the query rows from it — a zero-file source would yield
    // zero rows here
    val rows = graft.SparkEntry.queries("streaming_ann_gate")(spark, dirCorpus).count()
    assert(rows > 0, "directory-layout embeddings stream drained zero rows")
  }
}
