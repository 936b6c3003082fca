package graft.text

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
  * a handful of rounds even at 100 TB. (For adversarial long-chain
  * graphs the alternating large-star/small-star variant of
  * Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14, drops this to O(log n) rounds — same per-round plan shape,
  * so it can be swapped in without touching callers.)
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
      .localCheckpoint()

    var labels = nodes.select(col("id"), col("id").as("cluster_id")).localCheckpoint()
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
        .localCheckpoint()
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
    labels
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
}
