package graft

import org.apache.spark.sql.SparkSession

/** Debug runner for ExplainAudit.planWarnings on named queries:
  * prints the pre-AQE physical plan tree classes and the warnings.
  */
object AuditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --all: sweep the structural net over EVERY registered query
    // (r17 — the ExplainAudit main audits a curated 73; this mode
    // proves the whole surface clean, allowlists applied per name)
    if (args.toSeq == Seq("--all")) {
      var bad = 0
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          val (ws, notes) = ExplainAudit.planWarningsDetail(df, Some(name))
          if (ws.nonEmpty) { bad += 1
            println(s"!! $name: ${ws.mkString("; ")}")
          } else if (notes.nonEmpty)
            println(s"-- $name: ${notes.size} allowlisted note(s)")
        } catch { case e: Throwable =>
          println(s"?? $name: construction failed: ${e.getMessage}")
        }
      }
      // collision-class defense (r18): every data-derived plan
      // constant recorded while constructing the 355 plans above must
      // be disjoint from the bounds registries — the lattice cannot
      // silently re-collide as SFs or generation laws change
      val coll = DerivedConstants.collisions()
      coll.foreach(c => println(s"!! derived-constant collision: $c"))
      println(s"derived constants recorded: ${DerivedConstants.recorded
        .map { case (q, l, v) => s"$q.$l=$v" }.mkString(", ")}")
      println(s"sweep done: ${bad + coll.size} queries with structural warnings")
      spark.stop()
      return
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_semantic_scaled", "dedup_semantic_lloyd",
        "feat_quantile_bin", "q5_join", "sim_ivf_incremental")
    names.foreach { name =>
      println(s"\n======== $name ========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val ws = ExplainAudit.planWarnings(df)
      println(if (ws.isEmpty) "WARNINGS: none" else ws.mkString("WARNINGS:\n  ", "\n  ", ""))
      if (ws.nonEmpty) {
        import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join => LJoin}
        df.queryExecution.optimizedPlan.foreach {
          case j: LJoin =>
            Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).foreach {
              case (Some(h), side) if h.strategy.contains(BROADCAST) =>
                println(s"--- hinted side:\n${side.treeString.take(3000)}")
              case _ =>
            }
          case _ =>
        }
        df.queryExecution.sparkPlan.foreach {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty =>
            println(s"--- unpartitioned window child:\n${w.child.treeString.take(3000)}")
          case _ =>
        }
      }
    }
    spark.stop()
  }
}
