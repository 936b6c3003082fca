package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** End-to-end composition test: the LLM-data-pipeline operators are
  * not just individually oracle-green — they CHAIN. quality gate →
  * near-dup survivor selection → balanced sampling produces one final
  * kept-set, the stages interlock on doc_id, and the whole chain is
  * bit-deterministic across independent evaluations (no RNG, no
  * partition-order dependence anywhere — the property every
  * reproducible-training-data pipeline needs).
  */
class PipelineIntegrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** doc_ids a near-dup cluster drops (everyone but the longest-doc
    * representative) — same LSH → exact-verify → CC → argmax chain as
    * the dedup_canonical query, via the reusable helpers.
    */
  private def dedupRemoved(): Set[Long] = {
    val shingled = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        array_distinct(TextFunctions.shingles(col("text"), 3)).as("shset"))
      .where(size(col("shset")) > 0)
      .localCheckpoint()
    val sigs = shingled.select(col("id"),
      Dedup.minhashSignature(col("shset"), 64).as("sig"))
    val cands = Dedup.lshCandidatePairs(sigs, "id", "sig", 16)
    val sa = shingled.toDF("a_id", "a_sh")
    val sb = shingled.toDF("b_id", "b_sh")
    val edges = cands.join(sa, "a_id").join(sb, "b_id")
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("uni", size(col("a_sh")) + size(col("b_sh")) - col("inter"))
      .where(col("inter") * 10 >= col("uni") * 9 && col("uni") > 0)
      .select(col("a_id").as("a"), col("b_id").as("b"))
    val assign = Cluster.connectedComponents(shingled.select(col("id")), edges)
    val members = assign
      .join(Tables.documents(spark, dir).select(col("doc_id").as("id"), col("n_chars")), "id")
      .select(col("id"), col("cluster_id"), (col("n_chars") * 1000000L + col("id")).as("kk"))
    val reps = members.groupBy("cluster_id").agg(max("kk").as("mk"))
      .select((col("mk") % 1000000L).as("rep"))
      .collect().map(_.getLong(0)).toSet
    members.collect().map(_.getLong(0)).filterNot(reps).toSet
  }

  private def keptSet(): Seq[Long] = {
    val quality = SparkEntry.queries("text_filter_audit")(spark, dir)
      .where(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val removed = dedupRemoved()
    val sampled = SparkEntry.queries("sample_balanced")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val afterDedup = quality -- removed
    val finalKept = afterDedup intersect sampled
    // stage-wise structure: every stage keeps a nonempty set, the
    // chain monotonically shrinks, and both dedup and sampling
    // actually bite (strict drops), so no stage is vacuous
    assert(quality.nonEmpty && afterDedup.nonEmpty && finalKept.nonEmpty)
    assert(afterDedup.size < quality.size,
      s"dedup removed nothing from the quality-kept set (${quality.size})")
    assert(finalKept.size < afterDedup.size,
      s"sampling dropped nothing (${afterDedup.size})")
    finalKept.toSeq.sorted
  }

  test("quality gate -> near-dup survivors -> balanced sample chains deterministically") {
    val once = keptSet()
    val twice = keptSet() // fully re-evaluated: new jobs, new partitioning luck
    assert(once == twice, s"pipeline is not deterministic: ${once.size} vs ${twice.size}")
  }

  test("recomputed dedup removal agrees with the dedup_canonical query totals") {
    val removed = dedupRemoved()
    val canonical = SparkEntry.queries("dedup_canonical")(spark, dir)
      .agg(sum("n_removed").cast("long")).collect()(0).getLong(0)
    assert(removed.size.toLong == canonical,
      s"member-level removal ${removed.size} != query n_removed total $canonical")
  }

  test("classifier, calibration, audit, and threshold profile interlock") {
    // cross-query conservation laws: the per-doc classifier output,
    // its calibration rollup, the rule audit it was trained on, and
    // the pairwise threshold profile must all describe the SAME
    // corpus — each equality below fails if any one of them drops,
    // duplicates, or re-labels rows the others keep.
    val docs = Tables.documents(spark, dir).count()
    val scored = SparkEntry.queries("text_quality_classifier")(spark, dir)
      .select("y", "p_micro").collect()
    assert(scored.length.toLong == docs, "classifier must score every doc")
    val calib = SparkEntry.queries("text_quality_calibration")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(calib.map(_._1).sum == docs, "calibration bins must partition the corpus")
    assert(calib.map(_._2).sum == scored.map(_.getLong(0)).sum,
      "calibration keep totals must equal the classifier's label sum")
    assert(calib.map(_._3).sum == scored.map(_.getLong(1)).sum,
      "calibration probability mass must equal the classifier's")
    val auditKeeps = SparkEntry.queries("text_filter_audit")(spark, dir)
      .where(col("keep")).count()
    assert(scored.map(_.getLong(0)).sum == auditKeeps,
      "classifier labels must be exactly the audit's keep verdicts")
    // the threshold profile's >= 0.3 mass must equal the jaccard
    // query's pair count (same join, same integer threshold)
    val profHigh = SparkEntry.queries("dedup_threshold_profile")(spark, dir)
      .where(col("bin") >= 3).agg(sum("n_pairs")).collect()(0).getLong(0)
    val jacPairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count()
    assert(profHigh == jacPairs,
      s"profile bins >= 3 hold $profHigh pairs, dedup_ngram_jaccard reports $jacPairs")
  }

  test("the DSIR family interlocks: batch weights == streamed gate mass == selection") {
    // model (text_dsir), serve-stream gate (streaming_dsir_gate), and
    // deterministic selection (sample_dsir_select) must describe the
    // SAME trained sampler over the SAME corpus: the streamed
    // per-source weight mass must total the batch per-doc weights
    // exactly (integer arithmetic, so equality is exact, not ±ulp),
    // and the selected set must be precisely the batch ranking's top
    // quarter under the (w DESC, doc_id) order.
    val batch = SparkEntry.queries("text_dsir")(spark, dir)
      .select("doc_id", "w_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gate = SparkEntry.queries("streaming_dsir_gate")(spark, dir)
      .select("n_docs", "w_micro_sum").collect()
    assert(gate.map(_.getLong(0)).sum == batch.length.toLong,
      "the stream must score every document exactly once")
    assert(gate.map(_.getLong(1)).sum == batch.map(_._2).sum,
      "streamed weight mass must equal the batch weights, integer-exact")
    val selected = SparkEntry.queries("sample_dsir_select")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = batch.sortBy { case (id, w) => (-w, id) }
      .take(batch.length / 4).map(_._1).toSeq
    assert(selected == expected,
      "selection must be the batch ranking's exact top quarter")
  }
}
