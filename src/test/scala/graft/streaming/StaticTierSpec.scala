package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions.col

import graft.{SparkSpec, StaticTier}

/** The gates' Broadcast | ShuffledStatic tier law (r15): both tiers
  * are the SAME logical probe join, so their results must be
  * bit-equal — and the shuffled tier's physical plan must actually
  * shed the broadcasts (a hint that silently falls back to broadcast
  * would make the "past broadcast limits" story vacuous). The
  * GraphLoopsSpec two-tier discipline, applied to all five gates.
  */
class StaticTierSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("dedup gate: shuffled-static decisions == broadcast decisions, per doc") {
    val b = rows(StreamingOps.dedupGatePerDocOnce(spark, sf0001))
    val sh = rows(StreamingOps.dedupGatePerDocOnce(spark, sf0001,
      StaticTier.ShuffledStatic))
    assert(sh == b, "tier change altered streamed dedup decisions")
  }

  test("phash gate batch twin: tiers bit-equal; shuffled plan sheds every broadcast join") {
    val b = StreamingOps.phashGateBatchTwin(spark, sf0001)
    val sh = StreamingOps.phashGateBatchTwin(spark, sf0001,
      StaticTier.ShuffledStatic)
    assert(rows(sh) == rows(b), "tier change altered phash decisions")
    val p = sh.queryExecution.explainString(FormattedMode)
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") == 0,
      s"shuffled tier must not broadcast any probe side:\n$p")
    assert(n("ShuffledHashJoin") + n("SortMergeJoin") >= 3,
      s"want the 3 probe joins shuffled (source/index/verify):\n$p")
  }

  test("dedup batch twin: shuffled plan sheds both index broadcasts") {
    import graft.text.Dedup
    val docs = graft.Tables.documents(spark, sf0001)
    val hashed = Dedup.portableHashedShingles(docs, col("text")).localCheckpoint()
    val banded = Dedup.portableBandedIndex(hashed, "doc_id")
    val broadcastTier = Dedup.portableDedupProbe(docs, banded, hashed)
    val shuffledTier = Dedup.portableDedupProbe(docs, banded, hashed,
      StaticTier.ShuffledStatic)
    assert(rows(shuffledTier) == rows(broadcastTier))
    val p = shuffledTier.queryExecution.explainString(FormattedMode)
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") == 0,
      s"shuffled tier must not broadcast the index sides:\n$p")
    assert(n("ShuffledHashJoin") + n("SortMergeJoin") >= 2,
      s"want both index joins shuffled:\n$p")
  }

  test("ann gate: tiers bit-equal per query") {
    val b = rows(StreamingOps.annGatePerQueryOnce(spark, sf0001))
    val sh = rows(StreamingOps.annGatePerQueryOnce(spark, sf0001,
      StaticTier.ShuffledStatic))
    assert(sh == b, "tier change altered ANN top-1 results")
  }

  test("dsir and bpe gates: tiers bit-equal per source") {
    assert(rows(StreamingOps.dsirGateOnce(spark, sf0001,
        StaticTier.ShuffledStatic)) ==
      rows(StreamingOps.dsirGateOnce(spark, sf0001)),
      "tier change altered DSIR weights")
    assert(rows(StreamingOps.bpeGateOnce(spark, sf0001,
        StaticTier.ShuffledStatic)) ==
      rows(StreamingOps.bpeGateOnce(spark, sf0001)),
      "tier change altered BPE token accounting")
  }
}
