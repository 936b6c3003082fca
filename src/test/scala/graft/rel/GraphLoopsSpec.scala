package graft.rel

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The iterative-loop strategy tier: GraphLoops.CoPartitioned must be
  * bit-identical to GraphLoops.Broadcast (all three loops use
  * order-independent integer arithmetic, so the join strategy cannot
  * change a single bit) and must never move the edge list after the
  * one build-time pin — that is the property that makes the loops
  * viable when node state outgrows driver/executor broadcast limits.
  */
class GraphLoopsSpec extends SparkSpec {

  // the same customer<->supplier bipartite graph the graph_* queries
  // run on, at sf0.01
  private lazy val bipartite: DataFrame = {
    val eh = Tables.orders(spark, sf001)
      .join(Tables.lineitem(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("a"),
        (-col("l_suppkey")).cast("long").as("b"))
      .distinct()
    eh.unionAll(eh.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()
  }

  test("pagerank: CoPartitioned is bit-identical to Broadcast at sf0.01") {
    val edges = Tables.orders(spark, sf001)
      .join(Tables.lineitem(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    val und = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    val (bc, itB) = PageRank.run(und, maxIter = 10)
    val (cp, itC) = PageRank.run(und, maxIter = 10,
      strategy = GraphLoops.CoPartitioned)
    assert(itB == itC, s"strategies diverged on iteration count: $itB vs $itC")
    val a = bc.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = cp.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.length > 0 && a.sameElements(b),
      s"rank vectors differ: ${a.length} vs ${b.length} rows")
  }

  test("bfs: CoPartitioned is bit-identical to Broadcast at sf0.01") {
    val bc = GraphLoops.bfsHops(bipartite, 1L, 3)
    val cp = GraphLoops.bfsHops(bipartite, 1L, 3, GraphLoops.CoPartitioned)
    val a = bc.collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val b = cp.collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(a.length > 1 && a.sameElements(b),
      s"bfs results differ: ${a.length} vs ${b.length} rows")
  }

  test("bellman-ford: CoPartitioned is bit-identical to Broadcast at sf0.01") {
    val w = expr("abs(a) + abs(b)") % 9 + 1
    val ed = bipartite.select(col("a"), col("b"), w.as("w")).localCheckpoint()
    val bc = GraphLoops.bellmanFord(ed, 1L, 4)
    val cp = GraphLoops.bellmanFord(ed, 1L, 4, GraphLoops.CoPartitioned)
    val a = bc.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = cp.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.length > 1 && a.sameElements(b),
      s"distances differ: ${a.length} vs ${b.length} rows")
  }

  test("CoPartitioned per-round step never re-shuffles the edge list") {
    val ed = GraphLoops.pinEdges(bipartite, "a", GraphLoops.CoPartitioned)
    val state = spark.range(5).select(col("id").as("node"))
    val step = GraphLoops.stepPlanProbe(ed, state, GraphLoops.CoPartitioned)
    val p = step.queryExecution.explainString(FormattedMode)
    // the state side must build a shuffled hash table — not broadcast
    // (AQE demotion is blocked by the hint), not a sort-merge that
    // would re-sort the edges
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastExchange"), p)
    // exactly two exchanges in the plan TREE: the O(nodes) state
    // meeting the pinned edges + the aggregation after the probe. A
    // third would mean the pinned edge partitioning was lost and the
    // edges are moving every round.
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    val exchanges = tree.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"edge list is being re-shuffled:\n$p")
    // and specifically: nothing between the edge-side ExistingRDD scan
    // and the join may shuffle (the scan is the deepest left-branch
    // node, printed with ':' continuation markers)
    val edgeBranch = tree.filter(_.startsWith(" "))
      .filter(l => l.contains(":-") || l.contains(":  "))
    assert(edgeBranch.exists(_.contains("Scan ExistingRDD")),
      s"expected the pinned edge RDD on the left branch:\n$p")
    assert(edgeBranch.forall(!_.contains("Exchange")),
      s"exchange on the pinned edge branch:\n$p")
  }

  test("single-shot keyed pin: rows survive and the declared hash placement is physical") {
    // r19: hashPin declares HashPartitioning(key, n) on the rebuilt
    // LogicalRDD instead of planning the exchange AQE-off. The
    // declaration is only sound if the rows PHYSICALLY sit at
    // pmod(hash(key), n) — assert that per row, plus content equality
    // and the exchange-free downstream aggregate the pin exists for.
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ed = GraphLoops.pinEdges(bipartite, "a", GraphLoops.CoPartitioned)
    // content: nothing lost or duplicated by the checkpoint rebuild
    val got = ed.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = bipartite.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.length > 1 && got.sameElements(want), "pin changed the rows")
    // physical placement matches the declared partitioning per row
    // (spark `hash` == murmur3 seed 42 == HashPartitioning's expression)
    val misplaced = ed
      .select(col("a"), org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .where(expr(s"pid != pmod(hash(a), $n)"))
      .count()
    assert(misplaced == 0, s"$misplaced rows off their declared hash partition")
    // and the pin's purpose: a groupBy on the pin key plans exchange-free
    val agg = ed.groupBy("a").agg(count(lit(1)).as("c"))
    val p = agg.queryExecution.explainString(FormattedMode)
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(!tree.exists(_.contains("Exchange")),
      s"keyed pin lost its partitioning — aggregate re-shuffles:\n$p")
  }

  test("Broadcast per-round step broadcasts state and keeps edges in place") {
    val ed = GraphLoops.pinEdges(bipartite, "a", GraphLoops.Broadcast)
    val state = spark.range(5).select(col("id").as("node"))
    val step = GraphLoops.stepPlanProbe(ed, state, GraphLoops.Broadcast)
    val p = step.queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"), p)
    // only the post-probe aggregation shuffles
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    val exchanges = tree
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges <= 1, s"edge list is being shuffled under broadcast:\n$p")
  }
}
