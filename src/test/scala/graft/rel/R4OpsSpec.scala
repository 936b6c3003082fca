package graft.rel

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Invariant pins for the round-4 operator wave — each already
  * hash-checked against the DuckDB oracle in the verify gate; these
  * assertions guard the semantic properties a refactor could silently
  * break without changing the oracle in lockstep.
  */
class R4OpsSpec extends SparkSpec {

  test("events_transitions probabilities row-normalize per from_type") {
    val rows = SparkEntry.queries("events_transitions")(spark, sf001)
      .groupBy("from_type").agg(sum("p").as("psum"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
        s"${r.getString(0)} transition probabilities sum to ${r.getDouble(1)}")
    }
  }

  test("agg_histogram bins partition the table exactly") {
    val binned = SparkEntry.queries("agg_histogram")(spark, sf001)
      .agg(sum("n")).head().getLong(0)
    val total = graft.Tables.lineitem(spark, sf001).count()
    assert(binned == total, s"histogram covers $binned of $total rows")
  }

  test("sample_weighted is deterministic and stride-sized") {
    val s1 = SparkEntry.queries("sample_weighted")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    val s2 = SparkEntry.queries("sample_weighted")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "weighted sample must be reproducible run-to-run")
    // no doc outweighs a stride at this SF, so every stride boundary
    // selects exactly one doc
    assert(s1.size == 50, s"expected 50 systematic picks, got ${s1.size}")
  }

  test("text_filter_audit keep flag agrees with its reason code") {
    val bad = SparkEntry.queries("text_filter_audit")(spark, sf001)
      .where((col("keep") && col("reason") =!= "ok") ||
        (!col("keep") && col("reason") === "ok"))
      .count()
    assert(bad == 0, "keep must hold exactly when no rule fired")
  }

  test("tick_ewma stays inside the value envelope and seeds at v") {
    val out = SparkEntry.queries("tick_ewma")(spark, sf001)
      .orderBy("bucket").collect()
    assert(out.nonEmpty)
    val (vMin, vMax) = (out.map(_.getDouble(1)).min, out.map(_.getDouble(1)).max)
    out.foreach { r =>
      val e = r.getDouble(2)
      assert(e >= vMin - 1e-9 && e <= vMax + 1e-9,
        s"ewma $e escapes the value envelope [$vMin, $vMax]")
    }
    // the first bucket's window is just itself: ewma == v exactly
    assert(out.head.getDouble(2) == out.head.getDouble(1),
      "first-row ewma must equal its own value")
  }

  test("join_bloom_prune and events_dau_mau return sane non-empty shapes") {
    val bloom = SparkEntry.queries("join_bloom_prune")(spark, sf001)
    assert(bloom.count() > 0)
    val dm = SparkEntry.queries("events_dau_mau")(spark, sf001).collect()
    assert(dm.nonEmpty)
    dm.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "dau cannot exceed trailing mau")
      val st = r.getDouble(3)
      assert(st > 0.0 && st <= 1.0, s"stickiness $st out of (0, 1]")
    }
  }
}
