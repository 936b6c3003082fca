package graft

import org.apache.spark.sql.DataFrame

/** Checkpoint-provenance seam (r18 — the r17 verdict's top item): the
  * audit net's one structural blind spot was `LogicalRDD ⇒ bounded` —
  * a `localCheckpoint()` erases lineage, so a hinted broadcast of a
  * checkpointed FACT relation read "provably bounded" to
  * [[ExplainAudit.planWarnings]] with no warning, no note, and no
  * allowlist entry. Every past `weak` (the r14 seed window, the r15
  * seed broadcast, the r16 triangle closing side) was a growing
  * relation the net couldn't see; this seam makes the class
  * impossible to miss:
  *
  *  - Engine call sites route every lineage cut through
  *    [[checkpoint]], which evaluates the PRE-checkpoint logical plan
  *    under the net's own boundedness rules and records the verdict
  *    in a registry keyed by the checkpointed RDD's id (per-JVM,
  *    per-SparkContext — ids are only compared against plans built in
  *    the same session, which is all the audit ever does).
  *  - [[ExplainAudit.boundedLogical]]'s `LogicalRDD` case consults
  *    the registry: recorded-bounded ⇒ bounded, recorded-unbounded ⇒
  *    NOT bounded, and — the teeth — an UNRECORDED checkpoint (one
  *    that bypassed the seam) defaults to NOT bounded. A raw
  *    `broadcast(fact.localCheckpoint())` anywhere in the engine now
  *    trips the raw net (PlanSpec tripwire), and a seam-routed
  *    checkpoint of a fact subtree trips it too: the seam records
  *    provenance, it cannot launder it.
  *
  * Nested pins recurse naturally: a round-N checkpoint whose input
  * contains round-N−1's LogicalRDD resolves that child through the
  * registry while its own verdict is being computed, so an iterative
  * loop keeps its provenance chain (bounded state stays bounded;
  * a fact-derived edge pin stays unbounded through every round).
  *
  * There is deliberately NO `bounded = …` override: boundedness is
  * always derived from the plan, so a call site cannot declare its
  * way past the net. Reviewed data-sized broadcasts stay where they
  * belong — visible [[ExplainAudit.ReviewedBroadcasts]] exceptions.
  */
object Pinned {

  /** rddId -> was the pre-checkpoint plan bounded. */
  private val registry = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]()

  /** `df.localCheckpoint()` with provenance recorded. Drop-in for the
    * engine's lineage cuts (eager, same storage semantics).
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val wasBounded = ExplainAudit.boundedForPin(df)
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.foreach(id => registry.put(id, java.lang.Boolean.valueOf(wasBounded)))
    cp
  }

  /** Single-shot KEYED checkpoint (r19): one hash(key, n) shuffle +
    * one block write, with the partitioning DECLARED on the rebuilt
    * LogicalRDD (see graftbridge.KeyedCheckpoint for why declaring is
    * sound). Replaces the r18 two-step pin, which wrote the relation
    * twice and toggled the session-global AQE conf around the second
    * plan. Provenance is recorded exactly like [[checkpoint]], from
    * the PRE-checkpoint plan.
    */
  def checkpointKeyed(df: DataFrame, key: String): DataFrame = {
    val wasBounded = ExplainAudit.boundedForPin(df)
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val cp = org.apache.spark.sql.graftbridge.KeyedCheckpoint(df, key, n)
    cp.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.foreach(id => registry.put(id, java.lang.Boolean.valueOf(wasBounded)))
    cp
  }

  /** The net's lookup: Some(verdict) for seam-routed checkpoints,
    * None for a checkpoint that bypassed the seam (treated as
    * unbounded by the caller).
    */
  private[graft] def recordedBounded(rddId: Int): Option[Boolean] =
    Option(registry.get(rddId)).map(_.booleanValue())

  /** Free the executor block-storage copy behind a [[checkpoint]]ed
    * frame (r18). For a pin that exists only as the INPUT of another
    * pin (the two-step hash pin's intermediate, hitsAuthorities'
    * shared build), the blocks are dead weight once every derived pin
    * has materialized — releasing them halves the loop families'
    * resident edge copies. The frame must never be read again: a
    * local checkpoint has no lineage to recompute from (the same
    * contract RddHygiene's between-laps sweep relies on). The frame
    * must be a BARE checkpoint scan: releasing is destructive and a
    * silent no-op on anything else would hide a wiring bug, so a
    * non-LogicalRDD plan throws (r19, ADVICE item).
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case other => throw new IllegalStateException(
        "Pinned.release: expected a bare checkpointed LogicalRDD, got " +
          other.nodeName + " — only a materialized pin may be released")
    }

  /** `df.pinned` — the engine's spelling of a lineage cut. Every
    * query-path `localCheckpoint()` goes through this so the audit
    * net always has provenance; a bare `.localCheckpoint()` in the
    * engine is a seam bypass and reads as unbounded to the net.
    */
  implicit final class PinnedOps(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = Pinned.checkpoint(df)
  }
}
