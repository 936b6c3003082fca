package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the HITS / k-core / common-neighbor wave. The driver's
  * DuckDB gate hash-checks the real-data results; these pin what the
  * hashes can't: strategy-independence (Broadcast == CoPartitioned
  * bit-for-bit), mass conservation under truncating normalization,
  * multi-round peel cascades against a sequential reference, and a
  * sequential recomputation of the top link-prediction pair.
  */
class GraphExtrasSpec extends SparkSpec {

  private def orderEdges(sf: String) = {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    o.join(l, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_suppkey").as("v"))
      .distinct()
  }

  test("HITS: CoPartitioned strategy is bit-identical to Broadcast") {
    val e = orderEdges(sf0001)
    val b = GraphExtras.hitsAuthorities(e, 3, GraphLoops.Broadcast)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = GraphExtras.hitsAuthorities(e, 3, GraphLoops.CoPartitioned)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b == c, "authority vectors diverged between strategies")
    assert(b.nonEmpty)
  }

  test("HITS: TwoPhaseNorm (billion-node normalizer tier) is bit-identical to WindowNorm") {
    // the r13 normStrategy knob (r12 What's-wrong #2): the two-phase
    // partial-agg + broadcast-join normalizer replaces the
    // single-task empty-frame window past ~10^8 nodes; same truncating
    // integer arithmetic, so the authority vectors must match exactly
    val e = orderEdges(sf0001)
    val w = GraphExtras.hitsAuthorities(e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = GraphExtras.hitsAuthorities(e, 3,
        normStrategy = GraphExtras.TwoPhaseNorm)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w == t, "normalizer tiers diverged")
    assert(w.nonEmpty)
  }

  test("HITS: truncating sum-normalization conserves mass to within n units") {
    val a = GraphExtras.hitsAuthorities(orderEdges(sf0001), 3).collect()
    val total = a.map(_.getLong(1)).sum
    // each truncating division loses < 1 unit per node
    assert(total <= 1000000L && total >= 1000000L - a.length,
      s"authority mass $total outside [1e6 - n, 1e6]")
    assert(a.map(_.getLong(1)).forall(_ >= 0))
  }

  test("k-core peel cascades like a sequential reference on a path + triangle") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7 feeding a triangle 7-8-9: k=2 peels one path
    // endpoint per round (a genuine multi-round cascade); the triangle
    // is the 2-core and must survive any number of rounds
    val dir = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (7L, 8L), (8L, 9L), (9L, 7L))
    val und = dir ++ dir.map { case (a, b) => (b, a) }
    val df = und.toDF("a", "b")
    def sequential(rounds: Int): Set[(Long, Long)] = {
      var es = und.toSet
      var done = false
      var r = 0
      while (r < rounds && !done) {
        val deg = es.groupBy(_._1).view.mapValues(_.size).toMap
        val alive = deg.filter(_._2 >= 2).keySet
        val next = es.filter(e => alive(e._1) && alive(e._2))
        done = next == es
        es = next
        r += 1
      }
      es
    }
    (1 to 6).foreach { rounds =>
      Seq(GraphLoops.Broadcast, GraphLoops.CoPartitioned).foreach { st =>
        val got = GraphExtras.kcoreEdges(df, k = 2, maxRounds = rounds, st)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == sequential(rounds), s"divergence at maxRounds=$rounds ($st)")
      }
    }
    // the triangle is the fixpoint
    val core = GraphExtras.kcoreEdges(df, k = 2, maxRounds = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core == Set((7L, 8L), (8L, 9L), (9L, 7L),
      (8L, 7L), (9L, 8L), (7L, 9L)))
  }

  test("k-core: CoPartitioned is bit-identical to Broadcast on the sf0.01 co-order graph") {
    // the graph_kcore query's own graph (customer<->supplier, k=35) —
    // the r17 tier (r16 verdict Missing #3: the old per-round
    // broadcast(alive) had no fallback past node-set broadcast limits)
    val e = orderEdges(sf001)
      .select((col("u") * 2).as("a"), (col("v") * 2 + 1).as("b"))
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    def run(st: GraphLoops.Strategy) =
      GraphExtras.kcoreEdges(und, k = 35, maxRounds = 5, st)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bc = run(GraphLoops.Broadcast)
    val cp = run(GraphLoops.CoPartitioned)
    assert(bc == cp, s"tiers diverged: ${bc.size} vs ${cp.size} edges")
    assert(bc.nonEmpty, "vacuous: the 35-core is empty at sf0.01")
  }

  test("k-core CoPartitioned round never re-shuffles the pinned edge list") {
    import org.apache.spark.sql.execution.FormattedMode
    val e = orderEdges(sf0001)
      .select(col("u").as("a"), col("v").as("b"))
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val ed = GraphLoops.pinEdges(und, "b", GraphLoops.CoPartitioned)
    val alive = spark.range(5).select(col("id").as("node"))
    val step = GraphExtras.kcoreRound(ed, alive, 2, GraphLoops.CoPartitioned)
    val p = step.queryExecution.explainString(FormattedMode)
    // alive builds a shuffled hash table against the pinned edges —
    // never a broadcast, never a sort-merge re-sorting the edges
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastExchange"), p)
    // exactly two exchanges: the O(nodes) state meeting the pinned
    // edges + the partial-agged degree count's node-sized exchange
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(tree.count(_.contains("Exchange")) <= 2,
      s"edge list is being re-shuffled:\n$p")
    val edgeBranch = tree.filter(_.startsWith(" "))
      .filter(l => l.contains(":-") || l.contains(":  "))
    assert(edgeBranch.exists(_.contains("Scan ExistingRDD")),
      s"expected the pinned edge RDD on the left branch:\n$p")
    assert(edgeBranch.forall(!_.contains("Exchange")),
      s"exchange on the pinned edge branch:\n$p")
  }

  test("coreness h-index iteration matches a sequential reference and converges") {
    import spark.implicits._
    // path 1..7 + triangle 7-8-9: converged coreness is 1 on the path
    // spine and 2 on the triangle
    val dir = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (7L, 8L), (8L, 9L), (9L, 7L))
    val und = dir ++ dir.map { case (a, b) => (b, a) }
    val df = und.toDF("a", "b")
    def hIndex(vals: Seq[Long]): Long = {
      val sorted = vals.sorted.reverse
      sorted.zipWithIndex.map { case (c, i) => math.min(i + 1L, c) }.max
    }
    def sequential(rounds: Int): Map[Long, Long] = {
      val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var core = nbrs.view.mapValues(_.size.toLong).toMap
      (1 to rounds).foreach { _ =>
        core = nbrs.map { case (v, ns) => v -> hIndex(ns.map(core)) }
      }
      core
    }
    (1 to 4).foreach { rounds =>
      val got = GraphExtras.corenessHIndex(df, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == sequential(rounds), s"divergence at rounds=$rounds")
    }
    val converged = GraphExtras.corenessHIndex(df, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 6L).forall(converged(_) == 1L), "path spine coreness 1")
    assert(Seq(7L, 8L, 9L).forall(converged(_) == 2L), "triangle coreness 2")
    // strategy parity on real data
    val e = orderEdges(sf0001)
      .select(col("u").as("a"), col("v").as("b"))
    val undReal = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val bc = GraphExtras.corenessHIndex(undReal, 2, GraphLoops.Broadcast)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cp = GraphExtras.corenessHIndex(undReal, 2, GraphLoops.CoPartitioned)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bc == cp, "coreness strategies diverged")
  }

  test("common neighbors: top pair matches a sequential recomputation") {
    val rows = graft.SparkEntry.queries("graph_common_neighbors")(spark, sf0001)
      .collect()
    assert(rows.length == 20)
    val bySupp = orderEdges(sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (s1, s2, common, jac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (n1, n2) = (bySupp(s1), bySupp(s2))
      assert(common == (n1 & n2).size, s"common($s1,$s2)")
      assert(jac == common * 1000000L / (n1 | n2).size, s"jaccard($s1,$s2)")
      assert(jac <= 1000000L && common <= math.min(n1.size, n2.size))
    }
    // the report really is the global top by common count
    val allPairs = for {
      (s1, n1) <- bySupp.toSeq; (s2, n2) <- bySupp.toSeq if s1 < s2
    } yield (n1 & n2).size.toLong
    assert(rows.map(_.getLong(2)).min == allPairs.sorted.reverse.take(20).min)
  }

  test("label propagation finds non-degenerate communities on the sparsified graph") {
    // the hash gate proves engine parity; this pins what the hash
    // can't — that the k-NN sparsifier preserves community structure
    // (the RAW co-order graph collapses LPA to ONE label at every SF,
    // observed before the sparsifier landed) and the partition is a
    // partition: every supplier node labeled exactly once, labels
    // drawn from the node set.
    val rows = graft.SparkEntry.queries("graph_label_propagation")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = rows.map(_._1)
    assert(nodes.distinct.length == nodes.length, "a node was labeled twice")
    val nodeSet = nodes.toSet
    assert(rows.forall { case (_, lab) => nodeSet.contains(lab) },
      "a label is not a member node")
    val comms = rows.map(_._2).distinct.length
    assert(comms > 1, s"degenerate: all ${nodes.length} nodes in one community")
    assert(comms < nodes.length, s"degenerate: no propagation happened at all")
  }
}
