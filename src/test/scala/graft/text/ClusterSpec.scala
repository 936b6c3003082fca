package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, triangle, singleton") {
    // graph: 1-2-3-4 chain, 10-11-12 triangle, 20 isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val assign = Cluster.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L))
  }

  test("connected components: a long chain still converges") {
    // worst-case diameter for min-label propagation: one 40-node path
    val n = 40
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val assign = Cluster.connectedComponents(nodes, edges, maxIter = 50)
    assert(assign.where(col("cluster_id") =!= 0L).count() == 0,
      "every path node must collapse to the min label 0")
  }

  test("connected components match a union-find reference on random graphs") {
    // property check against an independent sequential implementation:
    // the distributed min-label propagation must produce exactly the
    // same partition of nodes as path-compressed union-find
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genGraph = for {
      n <- Gen.chooseNum(1, 24)
      nEdges <- Gen.chooseNum(0, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, edges.filter { case (a, b) => a != b })
    val prop = Prop.forAll(genGraph) { case (n, edges) =>
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val nodes = (0L until n.toLong).toDF("id")
      val edgeDf = if (edges.isEmpty)
        spark.emptyDataFrame.select(lit(0L).as("a"), lit(0L).as("b")).limit(0)
      else edges.toDF("a", "b")
      val got = Cluster.connectedComponents(nodes, edgeDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("large-star/small-star CC matches union-find on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genGraph = for {
      n <- Gen.chooseNum(1, 24)
      nEdges <- Gen.chooseNum(0, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, edges.filter { case (a, b) => a != b })
    val prop = Prop.forAll(genGraph) { case (n, edges) =>
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val nodes = (0L until n.toLong).toDF("id")
      val edgeDf = if (edges.isEmpty)
        spark.emptyDataFrame.select(lit(0L).as("a"), lit(0L).as("b")).limit(0)
      else edges.toDF("a", "b")
      val got = Cluster.connectedComponentsLogRounds(nodes, edgeDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("large-star/small-star CC collapses a long chain in few rounds") {
    // a 60-node path: plain propagation needs ~60 rounds, the star
    // algorithm's maxIter=25 default is ample (O(log n))
    val n = 60
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val assign = Cluster.connectedComponentsLogRounds(nodes, edges)
    assert(assign.where(col("cluster_id") =!= 0L).count() == 0,
      "every chain node must collapse to root 0 within the default round budget")
  }

  test("min-label propagation exhausting maxIter falls back to star contraction") {
    // a 30-node path with maxIter=3: propagation alone would stop 27
    // hops short and return WRONG labels; the fallback must finish it
    val n = 30
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val assign = Cluster.connectedComponents(nodes, edges, maxIter = 3)
    assert(assign.where(col("cluster_id") =!= 0L).count() == 0,
      "fallback must produce fully-converged labels, never partial ones")
  }

  test("dedup_clusters on sf0.01 finds the planted pair/triple structure") {
    val out = SparkEntry.queries("dedup_clusters")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the corpus plants 25 verified near-dup pairs at jaccard >= 0.9,
    // one of which is the 45~267~413 triple — clustering must merge the
    // triple's two pairs (45,267) and (45,413) plus edge (267,413) into
    // ONE cluster of 3, leaving 22 two-member clusters: 23 total
    assert(out.length == 23, s"expected 23 multi-member clusters, got ${out.length}")
    assert(out.contains((45L, 3L, 413L)), "triple 45/267/413 must be one cluster")
    assert(out.count(_._2 == 2L) == 22, "remaining clusters are all pairs")
  }
}
