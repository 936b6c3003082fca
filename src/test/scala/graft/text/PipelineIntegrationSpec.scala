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
  import spark.implicits._

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

  test("the dedup family composes: candidates -> verify -> clusters -> canonical -> span removal") {
    // one corpus driven through every tier, pinning that the tiers'
    // survivor/drop sets COMPOSE — no doc a later stage needs that an
    // earlier stage already canonicalized away, and no doc-level
    // keeper lost by the span-level action.
    val docs = Tables.documents(spark, dir)
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet

    // stage A/B: LSH candidates, then exact verify at BOTH thresholds
    // used by the published tiers (0.8 survivor tier, 0.9 cluster tier)
    val shingled = docs
      .select(col("doc_id").as("id"),
        array_distinct(TextFunctions.shingles(col("text"), 3)).as("shset"))
      .where(size(col("shset")) > 0)
      .localCheckpoint()
    val cands = Dedup.lshCandidatePairs(
      shingled.select(col("id"), Dedup.minhashSignature(col("shset"), 64).as("sig")),
      "id", "sig", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def verified(thr: Double) = Dedup.verifyPairs(
      cands.toSeq.toDF("a_id", "b_id"), shingled, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val v08 = verified(0.8)
    val v09 = verified(0.9)
    assert(v09.nonEmpty, "no 0.9-verified pairs — the chain is vacuous")
    assert(v09.subsetOf(v08), "threshold monotonicity: 0.9 pairs must be 0.8 pairs")
    assert(v08.subsetOf(cands), "verified pairs must come from the candidate set")

    // stage C/D via the PUBLISHED queries: cluster summaries and
    // canonical reps must describe the same components over v09
    val clusters = SparkEntry.queries("dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap // cluster -> n
    val canonical = SparkEntry.queries("dedup_canonical")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(canonical.map(_._1).toSeq.sorted == clusters.keys.toSeq.sorted,
      "canonical and clusters must report the SAME cluster ids")
    canonical.foreach { case (cid, rep, n, removed) =>
      assert(clusters(cid) == n, s"cluster $cid sizes disagree")
      assert(removed == n - 1, s"cluster $cid must keep exactly one survivor")
    }
    // member-level assignment: every 0.9 edge joins one component, the
    // rep is a member, and keepers/drops partition each cluster
    val assign = Cluster.connectedComponents(
        shingled.select(col("id")),
        v09.toSeq.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap // id -> cluster
    v09.foreach { case (a, b) =>
      assert(assign(a) == assign(b), s"verified pair ($a,$b) split across clusters")
    }
    val members = assign.groupBy(_._2).map { case (c, m) => c -> m.keys.toSet }
    canonical.foreach { case (cid, rep, _, _) =>
      assert(members(cid).contains(rep), s"cluster $cid rep $rep is not a member")
    }
    val keepers = canonical.map(_._2).toSet
    val dropped = canonical.flatMap { case (cid, rep, _, _) =>
      members(cid) - rep }.toSet
    assert(keepers.intersect(dropped).isEmpty,
      "a canonicalized keeper must never appear in a drop set")

    // the 0.8 survivor tier must agree with its published query AND
    // never drop a doc outside the 0.8-verified pair relation
    val survivors = SparkEntry.queries("dedup_minhash_survivors")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val survivorDrops = all -- survivors
    assert(survivorDrops == v08.map(_._2),
      "the survivor tier's drop set must be exactly the larger ends of 0.8 pairs")

    // stage E: span removal COMPOSES with doc-level dedup — running it
    // on the deduped corpus (keepers + unclustered docs) can only
    // shrink per-doc span removal, because dropping docs shrinks the
    // >=2-doc span relation. Pointwise law, not just totals.
    val dedupedDocs = docs.where(!col("doc_id").isin(dropped.toSeq: _*))
    val before = SparkEntry.queries("dedup_span_removal")(spark, dir)
      .select("doc_id", "n_removed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = Dedup.spanRemoval(dedupedDocs, col("text"), col("doc_id"))
      .select("doc_id", "n_removed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.keySet == all -- dropped,
      "span removal must return every deduped doc — it rewrites, never drops")
    after.foreach { case (id, nAfter) =>
      assert(nAfter <= before(id),
        s"doc $id: span removal grew after doc-dedup ($nAfter > ${before(id)})")
    }
    assert(after.values.sum < before.filterNot(k => dropped(k._1)).values.sum,
      "doc-level dedup must strictly weaken span-level duplication on this corpus")
  }

  test("the BPE family interlocks: encode totals == trained segmentation mass") {
    val docs = Tables.documents(spark, dir)
    // conservation law: summing the per-doc encode counts must equal
    // re-weighting the trained vocab segmentation by word frequency
    // (short words bypass training and count 1 symbol) — fails if the
    // encode join drops/duplicates words or train and encode segment
    // under different rule sets
    val toks = docs.select(explode(TextFunctions.tokens(col("text"))).as("word"))
    val freq = toks.groupBy("word").agg(count(lit(1)).as("freq"))
    val seg = CorpusQueries.bpeSegmentation(docs, rounds = 5)
      .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
    val expectedBpe = freq.join(seg, Seq("word"), "left")
      .agg(sum(col("freq") * coalesce(col("n_syms"), lit(1L))))
      .head().getLong(0)
    val enc = SparkEntry.queries("text_bpe_encode")(spark, dir)
      .agg(sum("n_words").cast("long"), sum("n_bpe_tokens").cast("long")).head()
    assert(enc.getLong(0) == toks.count(),
      "encode must count every whitespace token exactly once")
    assert(enc.getLong(1) == expectedBpe,
      s"encode BPE mass ${enc.getLong(1)} != segmentation mass $expectedBpe")
    // merge-rule counts are non-increasing: every later pair existed
    // (or was created with count <= the merged rule's count) earlier
    val cnts = SparkEntry.queries("text_bpe_train")(spark, dir)
      .collect().map(_.getLong(3)).toSeq
    assert(cnts.length == 5 && cnts == cnts.sorted.reverse,
      s"rule counts must be non-increasing: $cnts")
    // the STREAMED gate serves the same trained vocab: its per-source
    // masses must total the batch encode exactly (integer arithmetic)
    val gate = SparkEntry.queries("streaming_bpe_gate")(spark, dir)
      .agg(sum("n_docs").cast("long"), sum("words_sum").cast("long"),
        sum("bpe_tokens_sum").cast("long")).head()
    assert(gate.getLong(0) == docs.count(),
      "the stream must account every document exactly once")
    assert((gate.getLong(1), gate.getLong(2)) == ((enc.getLong(0), enc.getLong(1))),
      "streamed token masses must equal the batch encode, integer-exact")
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

  test("the dedup family's STREAMING leg interlocks: streamed drop set == batch drop set") {
    // the r12 verdict's one missing family triangle: the portable LSH
    // index is built once, then the SAME probe plan runs (a) over the
    // batch corpus and (b) over the drained document stream — the
    // per-doc decisions (candidate rows AND the drop flag) must be
    // identical, so a production crawl could swap batch backfill and
    // live gating without changing what gets dropped.
    val docs = Tables.documents(spark, dir)
    val hashedIdx = Dedup.portableHashedShingles(docs, col("text"))
      .localCheckpoint()
    val banded = Dedup.portableBandedIndex(hashedIdx, "doc_id")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val batch = rows(Dedup.portableDedupProbe(docs, banded, hashedIdx))
    val streamed = rows(graft.streaming.StreamingOps.dedupGatePerDocOnce(spark, dir))
    assert(streamed.length == batch.length,
      "the stream must decide every document exactly once")
    assert(streamed.toSet == batch.toSet,
      "streamed per-doc decisions must equal the batch twin exactly")
    val dropped = batch.filter(_._4 == 1L).map(_._1).toSet
    assert(dropped.nonEmpty, "the corpus's planted near-dups must trip the gate")
    // the drop rule is nearDedupSurvivors': the LARGER id of each
    // verified pair dies, so the smallest doc_id can never drop
    assert(!dropped.contains(batch.map(_._1).min),
      "the smallest doc_id has no earlier candidate and must survive")
  }

  test("the MULTIMODAL streaming leg interlocks: streamed image decisions == batch twin") {
    // r14: the mm family's gate — the corpus's dHash band index built
    // once, the SAME probe plan (decode -> dHash -> band-bucket
    // broadcast join -> Hamming <= 8 verify -> per-image decision)
    // over (a) the batch uploads and (b) the drained upload stream.
    // Identical per-image decisions mean a media ingest can swap
    // batch backfill and live gating freely. Every planted jittered
    // re-upload (id >= PlantedIdOffset) must die against its original (the
    // Hamming 0..2 measurement), and the smallest doc_id must survive
    // (no earlier candidate exists).
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val batch = rows(graft.streaming.StreamingOps.phashGateBatchTwin(spark, dir))
    val streamed = rows(graft.streaming.StreamingOps.phashGatePerDocOnce(spark, dir))
    assert(streamed.length == batch.length,
      "the stream must decide every upload exactly once")
    assert(streamed.toSet == batch.toSet,
      "streamed per-image decisions must equal the batch twin exactly")
    val decisions = batch.map(r => r._1 -> r._4).toMap
    val planted = decisions.filter(_._1 >= graft.mm.Multimodal.PlantedIdOffset)
    assert(planted.size == 40 && planted.values.forall(_ == 1L),
      s"every planted jittered re-upload must be dropped: $planted")
    assert(decisions(batch.map(_._1).min) == 0L,
      "the smallest doc_id has no earlier candidate and must survive")
  }
}
