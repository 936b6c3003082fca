package graft

import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Canary for driver-regenerated testdata: the driver has rewritten
  * `/root/testdata` mid-round before (round 6: `events.ts` changed from
  * TIMESTAMP(NANOS) to timestamp[us] and broke 62 queries at plan
  * time). This spec pins the RAW physical schemas we depend on and
  * fails with an observed-vs-expected diff — one loud failure instead
  * of dozens of confusing downstream ones.
  */
class TestdataSchemaSpec extends SparkSpec {

  private def raw(name: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf0001/$name.parquet").schema
  }

  private def assertSchema(name: String, expected: Seq[(String, Seq[DataType])]): Unit = {
    val got = raw(name)
    val diffs = expected.flatMap { case (col, okTypes) =>
      got.fields.find(_.name == col) match {
        case None => Some(s"$col: MISSING (expected one of ${okTypes.mkString("/")})")
        case Some(f) if !okTypes.contains(f.dataType) =>
          Some(s"$col: got ${f.dataType}, expected one of ${okTypes.mkString("/")}")
        case _ => None
      }
    } ++ {
      val extra = got.fieldNames.toSet -- expected.map(_._1).toSet
      if (extra.nonEmpty) Some(s"unexpected columns: ${extra.mkString(", ")}") else None
    }
    assert(diffs.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT in $name.parquet — the driver likely " +
        s"regenerated /root/testdata; update loaders/oracles before " +
        s"trusting any downstream failure:\n  ${diffs.mkString("\n  ")}\n" +
        s"full observed schema: ${got.simpleString}")
  }

  test("events.parquet physical schema is one of the two known variants") {
    // ts has shipped as LONG nanos (nanosAsLong view of TIMESTAMP(NANOS))
    // and as timestamp[us] (TIMESTAMP_NTZ). Tables.events adapts to both;
    // anything else must fail HERE first.
    assertSchema("events", Seq(
      "event_id" -> Seq(LongType),
      "ts" -> Seq(LongType, TimestampNTZType, TimestampType),
      "user_id" -> Seq(LongType),
      "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType),
      "props" -> Seq(StringType)))
  }

  // timestamp columns: the driver writes timestamp[us] (no tz) — read
  // back as NTZ under inference; TimestampType also accepted in case a
  // future generation flips isAdjustedToUTC
  private val tsUs: Seq[DataType] = Seq(TimestampNTZType, TimestampType)

  test("lineitem.parquet physical schema") {
    assertSchema("lineitem", Seq(
      "l_orderkey" -> Seq(LongType),
      "l_partkey" -> Seq(LongType),
      "l_suppkey" -> Seq(LongType),
      "l_linenumber" -> Seq(IntegerType, LongType),
      "l_quantity" -> Seq(DoubleType),
      "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType),
      "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType),
      "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> tsUs))
  }

  test("orders.parquet physical schema") {
    assertSchema("orders", Seq(
      "o_orderkey" -> Seq(LongType),
      "o_custkey" -> Seq(LongType),
      "o_orderstatus" -> Seq(StringType),
      "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> tsUs,
      "o_orderpriority" -> Seq(StringType)))
  }

  test("documents.parquet physical schema") {
    assertSchema("documents", Seq(
      "doc_id" -> Seq(LongType),
      "text" -> Seq(StringType),
      "lang" -> Seq(StringType),
      "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType)))
  }

  test("documents.n_chars equals length(text) — prefilter drift canary") {
    // text_levenshtein_pairs' oracle and several length prefilters
    // treat n_chars as the character count of text. If a future
    // generator writes byte counts or pre-normalization lengths, true
    // pairs would be dropped silently on BOTH sides of the oracle
    // compare — this canary turns that drift into one loud failure.
    val bad = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(expr("n_chars != length(text)")).count()
    assert(bad == 0L, s"$bad docs where n_chars != length(text)")
  }

  test("Tables.documents rejects a stale int32-n_chars slice loudly") {
    // Pre-r14 ScaleGen slices wrote n_chars as int32; the streaming
    // gates declare it LongType in their readStream schemas, and a
    // file-source readStream over a mismatched physical type yields
    // NULLs silently (every gate row dropped, zero errors). The loader
    // guard must turn that into one loud failure at open time.
    val dir = java.nio.file.Files.createTempDirectory("stale_slice").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("n_chars", expr("cast(n_chars as int)"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.documents(spark, dir)
    }
    assert(e.getMessage.contains("n_chars"), e.getMessage)
    assert(e.getMessage.contains("ScaleGen"), e.getMessage)
    // and the genuine driver corpus passes the guard untouched
    assert(Tables.documents(spark, sf0001).schema("n_chars").dataType == LongType)
  }

  test("embeddings.parquet physical schema") {
    assertSchema("embeddings", Seq(
      "vec_id" -> Seq(LongType),
      "embedding" -> Seq(ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false)),
      "label" -> Seq(IntegerType, LongType)))
  }

  test("Tables.events normalizes both ts variants to (ts_ns LONG, ts TIMESTAMP)") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts_ns").dataType == LongType, ev.schema.simpleString)
    assert(ev.schema("ts").dataType == TimestampType, ev.schema.simpleString)
    // the two views agree: ts is exactly ts_ns truncated to µs
    val bad = ev.where(expr("unix_micros(ts) != ts_ns DIV 1000")).count()
    assert(bad == 0L, s"$bad rows where ts != µs(ts_ns)")
  }
}
