package graft.text
import graft.Pinned.PinnedOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster grouping (SURVEY §2.C): connected components over
  * a near-duplicate pair graph, so a dedup pipeline can keep exactly
  * one representative per *cluster* instead of reasoning pair-by-pair
  * (a pair relation is not transitive: a~b and b~c does not imply a~c
  * was emitted, yet all three must collapse to one survivor).
  *
  * The components are computed by iterative min-label propagation:
  * every node starts labeled with its own id and repeatedly takes the
  * minimum label among itself and its neighbors until a fixpoint. Each
  * iteration is one shuffle-partitioned join + partial-aggregated
  * groupBy — no driver-side graph state, no cross join — so a round
  * scales linearly with executors. Convergence needs O(diameter)
  * rounds; near-duplicate graphs at corpus scale are overwhelmingly
  * tiny star/clique clusters (diameter ≤ 3), so the loop terminates in
  * a handful of rounds even at 100 TB. For adversarial long-chain
  * graphs, [[connectedComponentsLogRounds]] implements the alternating
  * large-star/small-star variant (O(log n) rounds) with the same
  * contract — swap it in without touching callers.
  *
  * Lineage is cut per round with `localCheckpoint`: without it the
  * iterated plan nests one join layer per round and the optimizer
  * re-analyzes a geometrically growing tree.
  */
object Cluster {

  /** Assign each node its component id = min node id reachable in the
    * undirected graph. `nodes` carries one column `id`; `edges` carries
    * `a`, `b` (one row per undirected edge, either orientation).
    * Returns (id, cluster_id).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    // both orientations once, up front: each round joins label(y) → x
    val und = edges.select(col("a").as("x"), col("b").as("y"))
      .union(edges.select(col("b").as("x"), col("a").as("y")))
      .pinned

    var labels = nodes.select(col("id"), col("id").as("cluster_id")).pinned
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = und
        .join(labels.select(col("id").as("y"), col("cluster_id")), "y")
        .groupBy(col("x").as("nid"))
        .agg(min("cluster_id").as("nbr_min"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
        .pinned
      // convergence probe: did ANY label strictly decrease this round?
      // limit(1) short-circuits the existence check — one tiny job,
      // no full count and no collect.
      val changed = next.select(col("id"), col("cluster_id").as("new_c"))
        .join(labels.select(col("id"), col("cluster_id").as("old_c")), "id")
        .where(col("new_c") < col("old_c"))
        .limit(1).count()
      converged = changed == 0L
      labels = next
      it += 1
    }
    if (!converged) {
      // diameter > maxIter: the propagation has NOT reached a fixpoint
      // and the labels are wrong. Never return them silently — finish
      // with the O(log n) star-contraction variant, whose round budget
      // covers diameters up to 2^maxIter.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents hit maxIter=$maxIter before convergence; " +
          "falling back to large-star/small-star (O(log n) rounds)")
      connectedComponentsLogRounds(nodes, edges)
    } else labels
  }

  /** Cluster summary over a component assignment: one row per
    * multi-member cluster (the singletons are the non-duplicates —
    * reporting them would just echo the corpus).
    */
  def clusterSummary(assign: DataFrame): DataFrame =
    assign.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"), max("id").as("max_doc"))
      .where(col("n_members") >= 2)
      .orderBy("cluster_id")

  /** The O(log n)-round variant: alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14). Same contract as [[connectedComponents]]; use this when
    * the duplicate graph may contain long chains — each round halves
    * tall trees instead of walking them one hop at a time.
    *
    *  - large-star: every node's LARGER neighbors re-attach to the
    *    minimum of its neighborhood (incl. itself). Each undirected
    *    edge is processed once, from its smaller endpoint's list.
    *  - small-star: every node and its SMALLER neighbors re-attach to
    *    the minimum among them.
    *
    * The fixed point is a forest of stars rooted at each component's
    * minimum id. Convergence is detected by an order-independent
    * checksum aggregate (count + two independent xor-folds of edge
    * hashes, collision odds ~2^-128) — one scalar aggregate per round,
    * no edge-set except() diff, no collect of the edges.
    */
  def connectedComponentsLogRounds(
      nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // canonical parent-pointer form: (u, v) with v < u, deduped
    def canon(e: DataFrame): DataFrame = e
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
    def checksum(e: DataFrame): (Long, Long, Long) = {
      // xor-fold of edge hashes: order-independent, overflow-free
      // under ANSI (a sum of hashes overflows long). Dedup rules out
      // xor self-cancellation, but distinct same-cardinality sets CAN
      // still collide (probability ~2^-64 per fold); folding a second
      // independent seed drives a spurious early stop to ~2^-128 —
      // negligible, not impossible.
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))"),
        expr("bit_xor(xxhash64(v, u))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    var e = canon(edges.select(col("a"), col("b"))).pinned
    var sig = checksum(e)
    var it = 0
    var converged = sig._1 == 0L
    while (!converged && it < maxIter) {
      // ---- large-star: emit (v, min(Γ(u) ∪ {u})) for v ∈ Γ(u), v > u
      val nbrs = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val afterLs = canon(
        nbrs.join(mins, "u").where(col("v") > col("u"))
          .select(col("v").as("a"), col("m").as("b")))
      // ---- small-star: for each u, attach u and its smaller
      // neighbors to their collective minimum
      val minsSs = afterLs.groupBy("u").agg(min("v").as("mv"))
      val afterSs = canon(
        afterLs.join(minsSs, "u").where(col("v") =!= col("mv"))
          .select(col("v").as("a"), col("mv").as("b"))
          .union(afterLs.join(minsSs, "u")
            .select(col("u").as("a"), col("mv").as("b"))))
        .pinned
      val nextSig = checksum(afterSs)
      converged = nextSig == sig
      sig = nextSig
      e = afterSs
      it += 1
    }
    // 2^maxIter diameter headroom makes exhaustion a genuine anomaly
    // (corrupt edge input, not a big graph) — never emit wrong labels
    if (!converged) throw new IllegalStateException(
      s"large-star/small-star did not converge in $maxIter rounds")
    nodes.select(col("id"))
      .join(e.select(col("u").as("id"), col("v")), Seq("id"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("cluster_id"))
  }
}
