package graft.tick

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TickVersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_tickver_spec").toString

  private def pts(rows: (String, Long, String, Long)*) =
    rows.toDF("index", "ts_ns", "field", "vc")

  private val day = 86400000000000L // ns

  test("versioned tick ingest round-trips and upserts by (index, ts_ns, field)") {
    val base = freshBase()
    val v1 = TickVersioned.commit(spark, base,
      pts(("cpu", 1L * day + 5, "load", 10L), ("cpu", 2L * day + 5, "load", 20L),
        ("mem", 1L * day + 9, "rss", 30L)))
    assert(v1 == 1)
    val v2 = TickVersioned.commit(spark, base,
      pts(("cpu", 1L * day + 5, "load", 99L))) // same tick key -> upsert
    assert(v2 == 2)

    val asOf1 = TickVersioned.readAsOf(spark, base, 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(asOf1 == Set(("cpu", 1L * day + 5, "load", 10L),
      ("cpu", 2L * day + 5, "load", 20L), ("mem", 1L * day + 9, "rss", 30L)),
      s"v1 must be the pre-upsert state: $asOf1")
    val asOf2 = TickVersioned.readAsOf(spark, base, 2)
      .where(col("index") === "cpu" && col("ts_ns") === 1L * day + 5)
      .collect().map(_.getLong(3)).toSeq
    assert(asOf2 == Seq(99L), "v2 must show the upserted value")
  }

  test("ranged as-of read scans only the in-range day directories") {
    val base = freshBase()
    TickVersioned.commit(spark, base,
      pts((1 to 9).map(i => ("s", i.toLong * day + 1, "v", i.toLong * 100)): _*))
    val ranged = TickVersioned.readAsOfRange(spark, base, 1,
      "1970-01-04", "1970-01-06")
    val files = ranged.inputFiles
    assert(files.nonEmpty && files.forall(f =>
      Seq("1970-01-04", "1970-01-05", "1970-01-06").exists(d => f.contains(s"part=$d"))),
      s"out-of-range day dirs must never reach the scan: ${files.mkString(", ")}")
    val got = ranged.collect().map(r => (r.getString(4), r.getLong(3))).toSet
    assert(got == Set(("1970-01-04", 300L), ("1970-01-05", 400L), ("1970-01-06", 500L)))
    // an empty range is an empty result, not an error
    assert(TickVersioned.readAsOfRange(spark, base, 1, "1969-01-01", "1969-12-31").isEmpty)
  }

  test("a '|' in index or field is rejected, not silently mangled") {
    val base = freshBase()
    intercept[IllegalArgumentException] {
      TickVersioned.commit(spark, base, pts(("a|b", 1L, "f", 1L)))
    }
    intercept[IllegalArgumentException] {
      TickVersioned.commit(spark, base, pts(("a", 1L, "f|g", 1L)))
    }
  }
}
