package graft.vec
import graft.Pinned.PinnedOps

import org.apache.spark.sql.functions._

import graft.{DerivedConstants, QueryDef, Tables}

/** Verify-gate entries for similarity search (SURVEY §2.C) over the
  * embeddings table (64-dim float vectors).
  */
object VecQueries {

  /** High-bit id space for planted near-duplicates in
    * `dedup_embedding_lsh`: real `vec_id`s are dense from 0, so
    * 2^40 keeps the planted range disjoint at any realistic SF
    * (collision would need a trillion-row corpus); `a_id < b_id`
    * orientation then always puts the real id on the a side.
    */
  val PlantedIdOffset: Long = 1L << 40

  /** Exemplar-seed selection for the scaled SemDeDup tiers — the nlist
    * corpus vectors with the smallest (md5(vec_id), vec_id) scramble —
    * WITHOUT a global row_number window (r15: the r14 global-window
    * version moved the whole fv corpus into ONE task, the exact
    * single-partition sort feat_quantile_bin was engineered to avoid).
    * Same two-phase exact-rank discipline:
    *
    *  phase 1: rows range-bucket by the first 4 hex chars of the md5
    *    key (65536 buckets that sort identically to the key — fixed-
    *    width lowercase hex compares lexicographically = numerically);
    *    per-bucket counts collapse map-side, and the exclusive prefix
    *    sum over that COLLAPSED <=65536-row bucket axis runs as a
    *    TWO-LEVEL scan with no unpartitioned window at all (r15: the
    *    first cut used `Window.orderBy(bkt)` here — structurally fine,
    *    the input is aggregate-collapsed and bounded, but it still
    *    fires Spark's `WindowExec: No Partition Defined` runtime
    *    warning on every (re)planning of the seed subtree, and the
    *    r14 verdict's done-bar for this tier is NO such warning in
    *    its execution): the 256 super-bucket totals collapse into ONE
    *    array row (the classic scan combine step, expressed as an
    *    aggregate), the exclusive prefix over that constant-size axis
    *    is an array HOF inside the row, and the within-super prefix
    *    window PARTITIONS by the super bucket. cum_before =
    *    sup_before + within-super prefix — bit-identical (long sums
    *    are order-free).
    *  phase 2: only buckets whose cumulative start sits below nlist
    *    can hold seeds; they broadcast back as (bkt, cum_before), the
    *    within-bucket rank runs bkt-PARTITIONED over those candidate
    *    rows only (~nlist of them), and global rank = cum_before +
    *    local rank; seeds = rank <= nlist.
    *
    * Bucket order is a prefix of the key order, so the selected set
    * AND the seed_id numbering are bit-identical to a global
    * `ROW_NUMBER() OVER (ORDER BY md5(vec_id), vec_id)` — the oracle
    * keeps that one-window replay while the Spark plan has no
    * unpartitioned window over a non-collapsed relation
    * (ExplainAudit.planWarnings is the net; PlanSpec pins it).
    * Returns (seed_id = rank-1, sv = fv, sn2 = |sv|²).
    */
  /** Exact argmin over a distance fan-out, as a HASH aggregate:
    * [[graft.functions.GraftExpressions.ArgMinLong]] keyed on idCol.
    * The point is the AGGREGATE STRATEGY — `min(struct(d2, cand))`
    * has no mutable hash buffer, so Spark plans SortAggregate, a full
    * sort of the n×nlist fan-out with interpreted struct comparators
    * (ProfSeeds A/B at gen3: the 36M-row assignment swings 4.1–42 s
    * with memory state as struct-min, runs flat as a hash aggregate);
    * a Decimal(38,0) pack IS hash-aggregable but allocates a
    * BigDecimal per fanned-out row (precision > 18 leaves the compact
    * long representation — ~4 µs/pair at gen10's 4×10⁸ pairs). The
    * two-long-buffer aggregate has neither cost and no value-range
    * bound at any nlist. `fan` must carry (idCol, "d2", candCol);
    * returns (idCol, outCol = the argmin candidate).
    */
  private[graft] def hashArgmin(fan: org.apache.spark.sql.DataFrame,
      idCol: String, candCol: String, outCol: String): org.apache.spark.sql.DataFrame = {
    import graft.functions.GraftExpressions.arg_min_long
    fan.groupBy(idCol)
      .agg(arg_min_long(col("d2"), col(candCol)).as(outCol))
  }

  /** The hier tiers' ROUTER machinery over a (checkpointed) seed
    * table: ncoarse = √nlist coarse routers — the first ncoarse
    * exemplar seeds, refined by one Lloyd half-step over ALL the
    * seeds (assign to the exemplars, per-cell integer means — the
    * trainCoarse shape at seed granularity; both relations are tiny,
    * every fan-out a constant-key broadcast equi-join) — and every
    * seed filed under its nearest refined router (its CELL). Returns
    * (cc = (cell, cv, cn2) routers, scell = (seed_id, cell) map);
    * probeable cells are the non-empty ones (join cc to scell's
    * distinct cells so a probed cell always holds candidates).
    * Shared by dedup_semantic_hier and dedup_semantic_lloyd_hier.
    */
  private[graft] def hierRouters(seeds: org.apache.spark.sql.DataFrame,
      ncoarse: Long)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import graft.functions.GraftExpressions.vec_dot
    val cex = seeds.where(col("seed_id") < ncoarse)
      .select(col("seed_id").as("x_id"), col("sv").as("xv"),
        col("sn2").as("xn2"))
    val s2c0 = hashArgmin(
      seeds.withColumn("jk", col("seed_id") % 1)
        .join(broadcast(cex.withColumn("jk", col("x_id") % 1)), "jk")
        .select(col("seed_id"),
          (col("sn2") - lit(2L) * vec_dot(col("sv"), col("xv")).cast("long") +
            col("xn2")).as("d2"),
          col("x_id")),
      "seed_id", "x_id", "cell0")
    val cc = seeds.join(s2c0, "seed_id")
      .select(col("cell0").as("cell"), posexplode(col("sv")).as(Seq("dim", "qv")))
      .groupBy("cell", "dim")
      .agg(expr("sum(qv) div count(1)").as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        x => x.getField("m")).as("cv"))
      .select(col("cell"), col("cv"),
        vec_dot(col("cv"), col("cv")).cast("long").as("cn2"))
    val scell = hashArgmin(
      seeds.withColumn("jk", col("seed_id") % 1)
        .join(broadcast(cc.withColumn("jk", col("cell") % 1)), "jk")
        .select(col("seed_id"),
          (col("sn2") - lit(2L) * vec_dot(col("sv"), col("cv")).cast("long") +
            col("cn2")).as("d2"),
          col("cell")),
      "seed_id", "cell", "cell")
    (cc, scell)
  }

  private[graft] def exemplarSeeds(f: org.apache.spark.sql.DataFrame,
      nlist: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftExpressions.vec_dot
    val fk = f.select(col("vec_id"), col("fv"),
        md5(col("vec_id").cast("string")).as("mk"))
      .withColumn("bkt", conv(substring(col("mk"), 1, 4), 16, 10).cast("long"))
    // The whole cuts derivation rides ONE aggregation chain into a
    // single combine row, then array HOFs inside that row — no
    // window, no broadcast-join chain, no re-computed subtree (the
    // first cut of this scan paid ~0.8 s of per-stage scheduling
    // overhead for a supOff broadcast join + a second partitioned
    // window; ProfSeeds is the A/B). Work stays trivially bounded:
    // the super prefix is 256² in-row adds, and the within-super
    // prefix only expands SUPERS THAT CAN HOLD SEEDS (sup_before <
    // nlist — a handful of 256-element arrays).
    val counts = fk.groupBy("bkt").agg(count(lit(1)).as("bc"))
    val supRows = counts
      .groupBy(expr("bkt div 256").as("sup"))
      .agg(array_sort(collect_list(struct(col("bkt"), col("bc")))).as("sarr"),
        sum("bc").as("sc"))
    val cuts = supRows
      .agg(array_sort(collect_list(struct(col("sup"), col("sc"), col("sarr"))))
        .as("arr"))
      // sk: the sc column alone — the super prefix slices THIS skinny
      // long array, never arr itself (arr elements carry the nested
      // 256-struct sarr; slicing those copied ~8M structs per row and
      // was the measured hot spot of the first cut)
      .select(col("arr"), expr("transform(arr, x -> x.sc)").as("sk"))
      .select(explode(expr(
        s"""flatten(transform(
           |  filter(
           |    transform(arr, (x, i) -> named_struct(
           |      'sup_before', aggregate(slice(sk, 1, i), CAST(0 AS BIGINT),
           |                              (a, y) -> a + y),
           |      'sarr', x.sarr)),
           |    s -> s.sup_before < ${nlist}L),
           |  s -> filter(
           |    transform(s.sarr, (b, j) -> named_struct(
           |      'bkt', b.bkt,
           |      'cum_before', s.sup_before +
           |        aggregate(slice(s.sarr, 1, j), CAST(0 AS BIGINT),
           |                  (a, y) -> a + y.bc))),
           |    e -> e.cum_before < ${nlist}L)))""".stripMargin)).as("c"))
      .select(col("c.bkt").as("bkt"), col("c.cum_before").as("cum_before"))
    val wIn = Window.partitionBy("bkt").orderBy("mk", "vec_id")
    fk.join(broadcast(cuts), "bkt")
      .withColumn("grank", row_number().over(wIn) + col("cum_before"))
      .where(col("grank") <= nlist)
      .select((col("grank") - 1).cast("long").as("seed_id"),
        col("fv").as("sv"), vec_dot(col("fv"), col("fv")).cast("long").as("sn2"))
  }

  /** Shared oracle prefix for the PCA pair: quantized coordinates,
    * exact co-moment covariance, and five integer power-iteration
    * rounds (see vec_pca_power's comment for the arithmetic bounds).
    */
  private val PcaCteSql: String =
    """WITH fx AS (
      |  SELECT vec_id, CAST(u.p[1] - 1 AS BIGINT) AS i,
      |         CAST(round(CAST(u.p[2] AS DOUBLE) * 1024) AS BIGINT) AS f
      |  FROM (SELECT vec_id, list_zip(range(1, len(embedding)+1), embedding) AS z
      |        FROM embeddings), unnest(z) AS u(p)),
      |nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM fx),
      |s AS (SELECT i, CAST(SUM(f) AS BIGINT) AS s FROM fx GROUP BY 1),
      |pp AS (SELECT a.i AS i, b.i AS j, CAST(SUM(a.f * b.f) AS BIGINT) AS p
      |       FROM fx a JOIN fx b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      |c AS (SELECT pp.i, pp.j,
      |        CAST(pp.p // nn.n - (s1.s // nn.n) * (s2.s // nn.n) AS BIGINT) AS c
      |      FROM pp CROSS JOIN nn
      |      JOIN s s1 ON pp.i = s1.i JOIN s s2 ON pp.j = s2.i),
      |v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS x FROM fx),
      |u1 AS (SELECT c.i, CAST(SUM(c.c * v0.x) AS BIGINT) AS u
      |       FROM c JOIN v0 ON c.j = v0.i GROUP BY 1),
      |m1 AS (SELECT CAST(MAX(ABS(u)) // 1000000 + 1 AS BIGINT) AS nd FROM u1),
      |v1 AS (SELECT i, CAST(u // nd AS BIGINT) AS x FROM u1, m1),
      |u2 AS (SELECT c.i, CAST(SUM(c.c * v1.x) AS BIGINT) AS u
      |       FROM c JOIN v1 ON c.j = v1.i GROUP BY 1),
      |m2 AS (SELECT CAST(MAX(ABS(u)) // 1000000 + 1 AS BIGINT) AS nd FROM u2),
      |v2 AS (SELECT i, CAST(u // nd AS BIGINT) AS x FROM u2, m2),
      |u3 AS (SELECT c.i, CAST(SUM(c.c * v2.x) AS BIGINT) AS u
      |       FROM c JOIN v2 ON c.j = v2.i GROUP BY 1),
      |m3 AS (SELECT CAST(MAX(ABS(u)) // 1000000 + 1 AS BIGINT) AS nd FROM u3),
      |v3 AS (SELECT i, CAST(u // nd AS BIGINT) AS x FROM u3, m3),
      |u4 AS (SELECT c.i, CAST(SUM(c.c * v3.x) AS BIGINT) AS u
      |       FROM c JOIN v3 ON c.j = v3.i GROUP BY 1),
      |m4 AS (SELECT CAST(MAX(ABS(u)) // 1000000 + 1 AS BIGINT) AS nd FROM u4),
      |v4 AS (SELECT i, CAST(u // nd AS BIGINT) AS x FROM u4, m4),
      |u5 AS (SELECT c.i, CAST(SUM(c.c * v4.x) AS BIGINT) AS u
      |       FROM c JOIN v4 ON c.j = v4.i GROUP BY 1),
      |m5 AS (SELECT CAST(MAX(ABS(u)) // 1000000 + 1 AS BIGINT) AS nd,
      |              CAST(MAX(ABS(u)) AS BIGINT) AS mx FROM u5),
      |v5 AS (SELECT i, CAST(u // nd AS BIGINT) AS x FROM u5, m5)""".stripMargin

  /** Spark side of the same pipeline: returns (fx quantized frame,
    * final 64-row component (i, x), 1-row (nd, mx) of the last round).
    */
  private def pcaPower(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val fx = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), col("p").cast("long").as("i"),
        expr("CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)").as("f"))
      .pinned // feeds nn, s, pp, v0 — pin the quantized frame
    val nn = fx.agg(countDistinct("vec_id").as("n"))
    val sS = fx.groupBy("i").agg(sum("f").as("s"))
    val pp = fx.as("a").join(fx.as("b"), "vec_id")
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.f") * col("b.f")).as("p"))
    val c = pp.crossJoin(broadcast(nn))
      .join(broadcast(sS.select(col("i"), col("s").as("si"))), "i")
      .join(broadcast(sS.select(col("i").as("j"), col("s").as("sj"))), "j")
      .select(col("i"), col("j"),
        expr("p div n - (si div n) * (sj div n)").as("c"))
      .pinned // 4096 rows drive all five iterations
    var v = fx.select("i").distinct().withColumn("x", lit(1000000L))
    var lastU: org.apache.spark.sql.DataFrame = null
    for (_ <- 1 to 5) {
      val u = c.join(broadcast(v.select(col("i").as("j"), col("x"))), "j")
        .groupBy("i").agg(sum(expr("c * x")).as("u"))
        .pinned
      val nd = u.agg(expr("CAST(max(abs(u)) div 1000000 + 1 AS BIGINT)").as("nd"),
        max(abs(col("u"))).as("mx"))
      lastU = nd
      v = u.crossJoin(broadcast(nd)).select(col("i"),
        expr("u div nd").as("x"))
    }
    (fx, v, lastU)
  }

  val defs: Map[String, QueryDef] = Map(

    // exact cosine top-5 for 10 query vectors, oracle-checked: the
    // DuckDB expression folds the dot product in the identical
    // left-to-right double order, so even the fp bits match
    "sim_bruteforce_topk" -> QueryDef(
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, c.vec_id AS id,
         |    ${VecFunctions.cosineSql("q.q_vec", "c.embedding")} AS sim
         |  FROM embeddings c, q WHERE q.q_id <> c.vec_id),
         |ranked AS (
         |  SELECT q_id, id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, id) AS rank
         |  FROM scored)
         |SELECT q_id, id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      VecFunctions.bruteForceTopK(queries, corpus, k = 5)
        .orderBy("q_id", "rank")
    },

    // exact MAXIMUM-INNER-PRODUCT top-5 — the recommender-retrieval
    // ranking (user·item affinity), which differs from cosine because
    // magnitude matters: a long vector can out-score a better-aligned
    // short one, so MIPS is NOT reducible to the cosine query without
    // the norm-augmentation transform. Scores are Σ fx20(q)·fx20(c)
    // in exact BIGINT (2^-20 fixed point; |x|<=4 → products < 2^44,
    // 64 dims < 2^50 — no overflow), so ranking AND scores are
    // hash-exact with deterministic (score DESC, id) ties. Scale
    // shape: 10 fx-encoded queries broadcast into one streamed corpus
    // scan + per-query top-k — identical to the cosine brute-force
    // tier, and the same IVF/PQ machinery applies when the corpus
    // outgrows a scan.
    "sim_mips_topk" -> QueryDef(
      s"""WITH f AS (SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, fv AS qv FROM f WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, c.vec_id AS id,
         |    CAST(list_sum(list_transform(range(64),
         |      i -> q.qv[i+1] * c.fv[i+1])) AS BIGINT) AS score
         |  FROM f c, q WHERE q.q_id <> c.vec_id),
         |ranked AS (
         |  SELECT q_id, id, score,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, id) AS rank
         |  FROM scored)
         |SELECT q_id, id, score, rank FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val fx = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      val q = fx.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("fv").as("qv"))
      val scored = fx.crossJoin(broadcast(q))
        .where(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("id"),
          aggregate(zip_with(col("qv"), col("fv"), (a, b) => a * b),
            lit(0L), (acc, v) => acc + v).as("score"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("score").desc, col("id"))))
        .where(col("rank") <= 5)
        .orderBy("q_id", "rank")
    },

    // HARD-NEGATIVE MINING for contrastive training: for each anchor
    // vector, the top-3 most-similar vectors with a DIFFERENT label —
    // the negatives that actually move an embedding model (random
    // negatives are trivially separable; the hard ones sit at the
    // decision boundary). Exact BIGINT inner products (2^-20 fixed
    // point, same overflow headroom as sim_mips_topk), deterministic
    // (score DESC, id) ties — ranking AND scores hash-exact. Scale
    // shape: the anchor set broadcasts into one streamed corpus scan
    // (label filter applied before the rank window cuts the pair
    // stream, never materializing it); when the corpus outgrows the
    // scan, the IVF/PQ candidate tiers feed the same label-filtered
    // verifier.
    "sim_hard_negatives" -> QueryDef(
      s"""WITH f AS (SELECT vec_id, label,
         |    list_transform(embedding,
         |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, fv AS qv
         |      FROM f WHERE vec_id < 50),
         |scored AS (
         |  SELECT q.q_id, q.q_label, c.vec_id AS id, c.label AS neg_label,
         |    CAST(list_sum(list_transform(range(64),
         |      i -> q.qv[i+1] * c.fv[i+1])) AS BIGINT) AS score
         |  FROM f c, q WHERE c.label <> q.q_label),
         |ranked AS (
         |  SELECT q_id, q_label, id, neg_label, score,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, id) AS rank
         |  FROM scored)
         |SELECT q_id, CAST(q_label AS BIGINT) AS q_label, id,
         |  CAST(neg_label AS BIGINT) AS neg_label, score, rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val fx = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      val q = fx.where(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("fv").as("qv"))
      fx.crossJoin(broadcast(q))
        .where(col("label") =!= col("q_label"))
        .select(col("q_id"), col("q_label").cast("long").as("q_label"),
          col("vec_id").as("id"), col("label").cast("long").as("neg_label"),
          aggregate(zip_with(col("qv"), col("fv"), (a, b) => a * b),
            lit(0L), (acc, v) => acc + v).as("score"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("score").desc, col("id"))))
        .where(col("rank") <= 3)
        .orderBy("q_id", "rank")
    },

    // BINARY-QUANTIZED retrieval: embeddings collapse to their sign
    // bits (64 dims -> 64 bits, a 32x compression — the third rung of
    // the quantization ladder after int8 and PQ) and candidates rank
    // by HAMMING distance, graded per hit against the exact
    // fixed-point top-5 from the same pass. Sign extraction, bit
    // disagreement counts, and both rankings are all integers with
    // deterministic ties, so the evaluation is hash-exact. At scale
    // the 8-byte signatures scan from memory and XOR+popcount replaces
    // 64 multiplies — the production shape of binary rescoring.
    "sim_hamming_topk" -> QueryDef(
      s"""WITH f AS (SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CASE WHEN CAST(x AS DOUBLE) >= 0 THEN 1 ELSE 0 END) AS sg,
         |    list_transform(embedding,
         |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, sg AS qs, fv AS qv FROM f WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, c.vec_id AS id,
         |    CAST(list_sum(list_transform(range(64),
         |      i -> CASE WHEN q.qs[i+1] <> c.sg[i+1] THEN 1 ELSE 0 END))
         |      AS BIGINT) AS hd,
         |    CAST(list_sum(list_transform(range(64),
         |      i -> q.qv[i+1] * c.fv[i+1])) AS BIGINT) AS s64
         |  FROM f c, q WHERE q.q_id <> c.vec_id),
         |rh AS (SELECT q_id, id, hd,
         |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hd, id) AS rank
         |       FROM scored),
         |rf AS (SELECT q_id, id FROM (
         |         SELECT q_id, id,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |                              ORDER BY s64 DESC, id) AS rank
         |         FROM scored) WHERE rank <= 5)
         |SELECT rh.q_id AS q_id, rh.rank AS rank, rh.id AS id, rh.hd,
         |  (rf.id IS NOT NULL) AS in_full_top5
         |FROM rh LEFT JOIN rf ON rf.q_id = rh.q_id AND rf.id = rh.id
         |WHERE rh.rank <= 5
         |ORDER BY rh.q_id, rh.rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"),
          x => when(x.cast("double") >= 0, 1).otherwise(0)).as("sg"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      val q = f.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("sg").as("qs"), col("fv").as("qv"))
      val scored = f.crossJoin(broadcast(q))
        .where(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("id"),
          aggregate(zip_with(col("qs"), col("sg"),
              (a, b) => when(a =!= b, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v).as("hd"),
          aggregate(zip_with(col("qv"), col("fv"), (a, b) => a * b),
            lit(0L), (acc, v) => acc + v).as("s64"))
        .pinned // both rankings consume it
      val rh = scored.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("hd"), col("id"))))
        .where(col("rank") <= 5)
      val rf = scored.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("s64").desc, col("id"))))
        .where(col("rank") <= 5)
        .select(col("q_id").as("fq"), col("id").as("fid"))
      rh.join(rf, col("fq") === col("q_id") && col("fid") === col("id"), "left")
        .select(col("q_id"), col("rank"), col("id"), col("hd"),
          col("fid").isNotNull.as("in_full_top5"))
        .orderBy("q_id", "rank")
    },

    // MATRYOSHKA (MRL) truncated-embedding retrieval evaluation: rank
    // by the 16-dim PREFIX of each 64-dim embedding — the modern
    // shrink-the-index trick (train embeddings so prefixes remain
    // usable, search the short prefix, optionally re-rank with the
    // full vector) — and report, per hit, whether the full-dimension
    // search agrees (`in_full_top5`). Both rankings are exact BIGINT
    // fixed-point dot products with deterministic ties, so the whole
    // evaluation is hash-exact; random embeddings make prefix/full
    // overlap low, which is precisely the signal the evaluation
    // exists to measure. One broadcast of 10 queries into one corpus
    // scan computes BOTH scores — the 4x-cheaper prefix scan is the
    // production path, the s64 column here exists to grade it.
    "sim_matryoshka_topk" -> QueryDef(
      s"""WITH f AS (SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, fv AS qv FROM f WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, c.vec_id AS id,
         |    CAST(list_sum(list_transform(range(16),
         |      i -> q.qv[i+1] * c.fv[i+1])) AS BIGINT) AS s16,
         |    CAST(list_sum(list_transform(range(64),
         |      i -> q.qv[i+1] * c.fv[i+1])) AS BIGINT) AS s64
         |  FROM f c, q WHERE q.q_id <> c.vec_id),
         |r16 AS (SELECT q_id, id, s16,
         |          ROW_NUMBER() OVER (PARTITION BY q_id
         |                             ORDER BY s16 DESC, id) AS rank
         |        FROM scored),
         |r64 AS (SELECT q_id, id FROM (
         |          SELECT q_id, id,
         |            ROW_NUMBER() OVER (PARTITION BY q_id
         |                               ORDER BY s64 DESC, id) AS rank
         |          FROM scored) WHERE rank <= 5)
         |SELECT r16.q_id AS q_id, r16.rank AS rank, r16.id AS id, r16.s16,
         |  (r64.id IS NOT NULL) AS in_full_top5
         |FROM r16 LEFT JOIN r64 ON r64.q_id = r16.q_id AND r64.id = r16.id
         |WHERE r16.rank <= 5
         |ORDER BY r16.q_id, r16.rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val fx = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      val q = fx.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("fv").as("qv"))
      def dotPrefix(n: Int) = aggregate(
        zip_with(slice(col("qv"), 1, n), slice(col("fv"), 1, n), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
      val scored = fx.crossJoin(broadcast(q))
        .where(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("id"),
          dotPrefix(16).as("s16"), dotPrefix(64).as("s64"))
        .pinned // both rankings consume it
      val r16 = scored.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("s16").desc, col("id"))))
        .where(col("rank") <= 5)
      val r64 = scored.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("s64").desc, col("id"))))
        .where(col("rank") <= 5)
        .select(col("q_id").as("fq"), col("id").as("fid"))
      r16.join(r64,
          col("fq") === col("q_id") && col("fid") === col("id"), "left")
        .select(col("q_id"), col("rank"), col("id"), col("s16"),
          col("fid").isNotNull.as("in_full_top5"))
        .orderBy("q_id", "rank")
    },

    // LSH-bucketed ANN top-5 (multi-probe Hamming-2 x 4 independent
    // tables): engine-hash bucketing — rows-only here; recall vs brute
    // force pinned in spec. 10-bit tables keep the touched fraction at
    // tables*probes/2^nBits ~ 22% on worst-case uniform vectors while
    // the independent tables compound misses (~0.54 recall vs 0.22
    // single-table at comparable cost).
    "sim_ann_topk" -> QueryDef.rowsOnly { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      VecFunctions.annTopK(queries, corpus, dim = 64, nBits = 10, k = 5,
          probeHamming = 2, nTables = 4)
        .orderBy("q_id", "rank")
    },

    // embedding-cosine near-duplicate pairs above a threshold — the
    // bounded brute-force oracle twin of the LSH tier below. Random
    // embeddings never reach cosine 0.5, so scaled copies (the
    // normalization-difference duplicate class: same direction, 1.5x
    // magnitude) are planted at vec_id+1000 with double arithmetic
    // mirrored exactly in SQL — the verifier then verifies 30 real
    // pairs instead of vacuously matching on an empty set.
    "dedup_embedding_cosine" -> QueryDef(
      s"""WITH base AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE vec_id < 100),
         |aug AS (
         |  SELECT vec_id, v FROM base
         |  UNION ALL
         |  SELECT vec_id + 1000, list_transform(v, x -> x * 1.5) FROM base
         |  WHERE vec_id < 30)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${VecFunctions.cosineSql("a.v", "b.v")} AS sim
         |FROM aug a JOIN aug b ON a.vec_id < b.vec_id
         |WHERE ${VecFunctions.cosineSql("a.v", "b.v")} > 0.5
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val base = Tables.embeddings(s, d).where(col("vec_id") < 100)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val planted = base.where(col("vec_id") < 30)
        .select((col("vec_id") + 1000).as("vec_id"),
          transform(col("v"), x => x * lit(1.5)).as("v"))
      val aug = base.unionByName(planted)
      val a = aug.select(col("vec_id").as("a_id"), col("v").as("a_vec"))
      val b = aug.select(col("vec_id").as("b_id"), col("v").as("b_vec"))
      a.crossJoin(b).where(col("a_id") < col("b_id"))
        .withColumn("sim", VecFunctions.cosine(col("a_vec"), col("b_vec")))
        .where(col("sim") > 0.5)
        .select("a_id", "b_id", "sim")
        .orderBy("a_id", "b_id")
    },

    // the UNBOUNDED scale tier of embedding dedup: LSH-bucketed pair
    // search (no vec_id cap, no pair space — candidates come from the
    // bucket join). ORACLE-EXACT since r11: the sign-LSH planes are
    // public splitmix constants (VecFunctions.planeComponents), the
    // vectors are cast to DOUBLE up front, and every dot product is
    // the same left-to-right fold in both engines — so the oracle
    // re-derives the identical buckets from shortest-round-trip plane
    // literals, replays the Hamming-1 multi-probe join per table, and
    // exact-cosine-verifies the same candidates. The gate now checks
    // the LSH pipeline's OUTPUT, not just row counts; recall vs the
    // planted ground truth stays pinned in VecSpec. Planted
    // near-copies (id | 2^40, ≈0.9996 cosine) keep the pair structure
    // non-trivial at any SF — a high-bit id space, so planted ids stay
    // disjoint from real ones up to a 10^12-row corpus (VecSpec pins
    // the disjointness against the test parquet).
    "dedup_embedding_lsh" -> QueryDef({
      def dotLit(vec: String, plane: Seq[Double]): String = {
        val lits = plane.map(x =>
          s"CAST(${java.lang.Double.toString(x)} AS DOUBLE)")
          .mkString("[", ", ", "]")
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(" +
          s"list_zip($vec, $lits), p -> p[1] * p[2])), (acc, x) -> acc + x)"
      }
      def bucket(vec: String, seed: Long): String =
        VecFunctions.planeComponents(dim = 64, nBits = 8, seed)
          .zipWithIndex.map { case (p, b) =>
            s"(CASE WHEN ${dotLit(vec, p)} > 0 THEN ${1L << b} ELSE 0 END)"
          }.mkString("(", " + ", ")")
      def cands(t: String): String =
        s"""SELECT a.id AS a_id, b.id AS b_id,
           |    ${VecFunctions.cosineSql("a.v", "b.v")} AS sim
           |  FROM $t a, mm, $t b
           |  WHERE xor(a.bucket, mm.m) = b.bucket AND a.id < b.id""".stripMargin
      s"""WITH base AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |aug AS (
         |  SELECT id, v FROM base
         |  UNION ALL
         |  SELECT id + ${VecQueries.PlantedIdOffset} AS id,
         |    list_transform(list_zip(v, range(0, 64)),
         |      p -> p[1] + CAST((p[2] % 5) - 2 AS DOUBLE) * 0.003) AS v
         |  FROM base WHERE id < 250),
         |t0 AS (SELECT id, v, ${bucket("v", 0L)} AS bucket FROM aug),
         |t1 AS (SELECT id, v, ${bucket("v", 1L)} AS bucket FROM aug),
         |mm AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS m),
         |cand AS (
         |  ${cands("t0")}
         |  UNION ALL
         |  ${cands("t1")})
         |SELECT a_id, b_id, max(sim) AS sim FROM cand WHERE sim > 0.98
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
      val base = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
      val planted = base.where(col("id") < 250)
        .select((col("id") + VecQueries.PlantedIdOffset).as("id"),
          zip_with(col("vec"), sequence(lit(0L), lit(63L)), (x, i) =>
            x + (i % 5 - 2).cast("double") * lit(0.003)).as("vec"))
      VecFunctions.embeddingNearDupPairs(
          base.unionByName(planted), dim = 64, nBits = 8,
          threshold = 0.98, probeHamming = 1, nTables = 2)
        .orderBy("a_id", "b_id")
    },

    // SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023): cluster the
    // corpus, then near-dup ONLY within clusters — the pair space is
    // Σ_c n_c², bounded by the cluster granularity knob (k tracks
    // corpus size so n_c stays fixed), never O(N²). Everything is
    // the repo's 2^-20 fixed point: centroids are per-label integer
    // means (the vec_centroids primitive), assignment is the exact
    // BIGINT argmin of vec_kmeans_assign, the within-cluster cosine
    // is an exact BIGINT dot over the quantized vectors with ONE
    // double op sequence (cast, sqrt, divide, 1e-6 grid round) at the
    // end — so the full pipeline, clustering included, hash-matches
    // the oracle. Drop rule: a vector with any >= 0.999-cosine
    // neighbor of smaller id in its cluster is dropped (the min-id
    // survivor convention of dedup_exact); output is the drop list
    // with each victim's keeper, partner count, and max similarity.
    // Random 64-dim embeddings never reach 0.999, so near-copies
    // (first coordinate jittered by 1..5 fx units, ids high-bit
    // disjoint per PlantedIdOffset) are planted for vec_id < 50 —
    // 50 live drop rows at any SF instead of a vacuous empty match.
    // Scale shape: one posexplode for centroids, one broadcast
    // argmin, one cluster-keyed self-join; the planted union is a
    // bounded second scan of a vec_id < 50 slice.
    "dedup_semantic" -> QueryDef(
      s"""WITH f AS (
         |  SELECT vec_id, label, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |aug AS (
         |  SELECT vec_id AS id, fv FROM f
         |  UNION ALL
         |  SELECT vec_id + ${VecQueries.PlantedIdOffset} AS id,
         |    list_prepend(fv[1] + (vec_id % 5) + 1, fv[2:64]) AS fv
         |  FROM f WHERE vec_id < 50),
         |q AS (SELECT CAST(label AS BIGINT) AS c_label, i AS dim, fv[i+1] AS qv
         |      FROM f, UNNEST(range(0, 64)) AS t(i)),
         |cent AS (SELECT c_label, dim, CAST(SUM(qv) AS BIGINT) // COUNT(*) AS m
         |         FROM q GROUP BY 1, 2),
         |aq AS (SELECT id, i AS dim, fv[i+1] AS qv
         |       FROM aug, UNNEST(range(0, 64)) AS t(i)),
         |dist AS (SELECT id, c_label, CAST(SUM((qv - m) * (qv - m)) AS BIGINT) AS d2
         |         FROM aq JOIN cent USING (dim) GROUP BY 1, 2),
         |asg AS (SELECT id, c_label AS cluster
         |        FROM (SELECT id, c_label,
         |                ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, c_label) AS rn
         |              FROM dist) WHERE rn = 1),
         |v AS (SELECT asg.id, asg.cluster, aug.fv,
         |        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(aug.fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS n2
         |      FROM asg JOIN aug ON asg.id = aug.id),
         |pr AS (SELECT a.id AS a_id, b.id AS b_id, a.cluster,
         |         CAST(round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(a.fv, b.fv), p -> p[1] * p[2])),
         |             (acc, x) -> acc + x) AS DOUBLE)
         |           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
         |           * 1000000) AS BIGINT) AS cos_micro
         |       FROM v a JOIN v b ON a.cluster = b.cluster AND a.id < b.id
         |       WHERE a.n2 > 0 AND b.n2 > 0)
         |SELECT b_id AS dropped_id, cluster, MIN(a_id) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_near, MAX(cos_micro) AS max_cos_micro
         |FROM pr WHERE cos_micro >= 999000
         |GROUP BY 1, 2 ORDER BY dropped_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      val aug = f.select(col("vec_id").as("id"), col("fv"))
        .unionByName(f.where(col("vec_id") < 50)
          .select((col("vec_id") + VecQueries.PlantedIdOffset).as("id"),
            concat(
              array(element_at(col("fv"), 1) + (col("vec_id") % 5) + 1),
              slice(col("fv"), 2, 63)).as("fv")))
      val cent = f
        .select(col("label").cast("long").as("c_label"),
          posexplode(col("fv")).as(Seq("dim", "qv")))
        .groupBy("c_label", "dim")
        .agg(expr("sum(qv) div count(1)").as("m"))
      val dist = aug
        .select(col("id"), posexplode(col("fv")).as(Seq("dim", "qv")))
        .join(broadcast(cent), "dim")
        .groupBy("id", "c_label")
        .agg(sum((col("qv") - col("m")) * (col("qv") - col("m"))).as("d2"))
      val wnd = Window.partitionBy("id").orderBy(col("d2"), col("c_label"))
      val asg = dist.withColumn("rn", row_number().over(wnd))
        .where(col("rn") === 1)
        .select(col("id"), col("c_label").as("cluster"))
      // exact BIGINT dots via the codegen'd vec_dot (identical
      // arithmetic to the oracle's list_reduce — every quantity an
      // integer < 2^53, so the doubles are exact; the interpreted
      // zip_with/aggregate HOFs this replaces cost ~2x wall on the
      // 400k-pair verify at sf0.1)
      import graft.functions.GraftExpressions.vec_dot
      val v = asg.join(aug, "id")
        .withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
      val a = v.select(col("id").as("a_id"), col("cluster"),
        col("fv").as("afv"), col("n2").as("an2"))
      val b = v.select(col("id").as("b_id"), col("cluster"),
        col("fv").as("bfv"), col("n2").as("bn2"))
      a.join(b, Seq("cluster"))
        .where(col("a_id") < col("b_id") && col("an2") > 0 && col("bn2") > 0)
        .withColumn("dot", vec_dot(col("afv"), col("bfv")).cast("long"))
        .withColumn("cos_micro", expr(
          "CAST(round(CAST(dot AS DOUBLE) / (sqrt(CAST(an2 AS DOUBLE)) * " +
            "sqrt(CAST(bn2 AS DOUBLE))) * 1000000) AS BIGINT)"))
        .where(col("cos_micro") >= 999000)
        .groupBy(col("b_id"), col("cluster"))
        .agg(min("a_id").as("keep_id"), count(lit(1)).as("n_near"),
          max("cos_micro").as("max_cos_micro"))
        .select(col("b_id").as("dropped_id"), col("cluster"),
          col("keep_id"), col("n_near"), col("max_cos_micro"))
        .orderBy("dropped_id")
    },

    // SEMANTIC DEDUP WITH THE CLUSTER-COUNT KNOB AS CODE (r14 — the
    // r13 verdict's top ask): dedup_semantic above runs SemDeDup at a
    // FIXED cluster granularity (the 10 label centroids), so its pair
    // space Σ_c n_c² grows as n²/10 — the r13 scaling table measured
    // 14.7× wall at 10× data. Production SemDeDup scales the cluster
    // COUNT with the corpus so the per-cluster population (and with it
    // the pair space per row) stays constant. Here that knob is code:
    //   nlist  = max(16, ceil(n / 100))   — n = base corpus rows
    //   stride = max(1, n div nlist)
    // and the nlist cluster seeds are EXEMPLAR VECTORS — the nlist
    // corpus vectors with the smallest md5(vec_id) scramble (a
    // deterministic uniform sample both engines order identically;
    // modular picks like `vec_id % stride` would correlate with the
    // label layout and collapse the partition). Assignment is the
    // exact BIGINT argmin of L2-to-seed — computed as n2 − 2·dot + s2
    // through the codegen'd vec_dot, every quantity < 2^53 so the
    // doubles are integers and the argmin is bit-deterministic — and
    // the within-cluster ≥0.999-cosine drop rule, planting, and
    // output shape are dedup_semantic's exactly. Scale shape: seeds
    // broadcast (nlist·64 longs), assignment is one map-side
    // argmin + one n-row aggregate, the self-join pair space is
    // Σ_c n_c² ≈ n·100 — LINEAR in n where the fixed tier is
    // quadratic (the gen0.1→gen1.0 stamp in BASELINE.md Round-14 is
    // the measured proof). At 100 TB the same formula just keeps
    // growing nlist; a Lloyd refinement of the exemplar seeds slots
    // in front of the assignment unchanged (trainCoarse is that
    // code), trading one more corpus pass for tighter clusters.
    "dedup_semantic_scaled" -> QueryDef(
      s"""WITH f AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |nl AS (SELECT GREATEST(16, (COUNT(*) + 99) // 100) AS nlist,
         |         GREATEST(1, COUNT(*) // GREATEST(16, (COUNT(*) + 99) // 100)) AS stride
         |       FROM embeddings),
         |seeds AS (
         |  SELECT rn - 1 AS seed_id, fv AS sv,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS sn2
         |  FROM (SELECT vec_id, fv, ROW_NUMBER() OVER (
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM f), nl
         |  WHERE rn <= nl.nlist),
         |aug AS (
         |  SELECT vec_id AS id, fv FROM f
         |  UNION ALL
         |  SELECT vec_id + ${VecQueries.PlantedIdOffset} AS id,
         |    list_prepend(fv[1] + (vec_id % 5) + 1, fv[2:64]) AS fv
         |  FROM f WHERE vec_id < 50),
         |av AS (SELECT id, fv,
         |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS n2
         |       FROM aug),
         |dist AS (SELECT av.id, seeds.seed_id,
         |           av.n2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(av.fv, seeds.sv), p -> p[1] * p[2])),
         |             (a, x) -> a + x) AS BIGINT) + seeds.sn2 AS d2
         |         FROM av, seeds),
         |asg AS (SELECT id, seed_id AS cluster FROM (
         |    SELECT id, seed_id,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, seed_id) AS rn
         |    FROM dist) WHERE rn = 1),
         |v AS (SELECT asg.id, asg.cluster, av.fv, av.n2
         |      FROM asg JOIN av USING (id)),
         |pr AS (SELECT a.id AS a_id, b.id AS b_id, a.cluster,
         |         CAST(round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(a.fv, b.fv), p -> p[1] * p[2])),
         |             (acc, x) -> acc + x) AS DOUBLE)
         |           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
         |           * 1000000) AS BIGINT) AS cos_micro
         |       FROM v a JOIN v b ON a.cluster = b.cluster AND a.id < b.id
         |       WHERE a.n2 > 0 AND b.n2 > 0)
         |SELECT b_id AS dropped_id, cluster, MIN(a_id) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_near, MAX(cos_micro) AS max_cos_micro
         |FROM pr WHERE cos_micro >= 999000
         |GROUP BY 1, 2 ORDER BY dropped_id""".stripMargin) { (s, d) =>
      import graft.functions.GraftExpressions.vec_dot
      // the KNOB: cluster count tracks the corpus (count() reads
      // parquet row-group metadata — an index-build-time scalar)
      val n = Tables.embeddings(s, d).count()
      val nlist = DerivedConstants.note("dedup_semantic_scaled", "nlist",
        math.max(16L, (n + 99L) / 100L))
      val f = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      // two-phase exact-rank exemplar selection (bit-identical to the
      // oracle's global ROW_NUMBER, no single-partition corpus sort)
      val seeds = VecQueries.exemplarSeeds(f, nlist)
      val aug = f.select(col("vec_id").as("id"), col("fv"))
        .unionByName(f.where(col("vec_id") < 50)
          .select((col("vec_id") + VecQueries.PlantedIdOffset).as("id"),
            concat(
              array(element_at(col("fv"), 1) + (col("vec_id") % 5) + 1),
              slice(col("fv"), 2, 63)).as("fv")))
      // repartition(id) BEFORE the fan-out: the n×nlist explode, its
      // per-pair vec_dot, and the partial argmin all execute in the
      // SCAN's task layout otherwise — and scan granularity tracks
      // input BYTES, not post-explode work (the 16 MB gen3 slice
      // yields 2 input partitions, so 36M fanned-out rows ran on 2 of
      // 32 cores: 109 s wall for ~100 s of CPU; r15 ProfSeeds stage
      // ledger). The exchange is NOT an extra shuffle: the plan needs
      // av hashpartitioned(id) anyway for the v = asg ⋈ av join, the
      // argmin's grouping requirement is satisfied for free. The count
      // is EXPLICIT (defaultParallelism = cluster width) because a
      // bare repartition(col) is AQE-coalescable, and AQE's byte
      // heuristic re-collapses the 31 MB exchange to one partition —
      // the fan-out is compute-bound, so its parallelism must track
      // CORES, not exchange bytes.
      val av = aug.withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      // constant-key broadcast equi-join = the seed fan-out without a
      // nested-loop operator (hash probe on an all-zeros key returns
      // all nlist seed rows per vector; the key derives from a data
      // column so constant folding can't collapse the equi-condition)
      val dist = av.withColumn("jk", col("id") % 1)
        .join(broadcast(seeds.withColumn("jk", col("seed_id") % 1)), "jk")
        .select(col("id"),
          (col("n2") - lit(2L) * vec_dot(col("fv"), col("sv")).cast("long") +
            col("sn2")).as("d2"),
          col("seed_id"))
      val asg = VecQueries.hashArgmin(dist, "id", "seed_id", "cluster")
      val v = asg.join(av, "id")
      val a = v.select(col("id").as("a_id"), col("cluster"),
        col("fv").as("afv"), col("n2").as("an2"))
      val b = v.select(col("id").as("b_id"), col("cluster"),
        col("fv").as("bfv"), col("n2").as("bn2"))
      a.join(b, Seq("cluster"))
        .where(col("a_id") < col("b_id") && col("an2") > 0 && col("bn2") > 0)
        .withColumn("dot", vec_dot(col("afv"), col("bfv")).cast("long"))
        .withColumn("cos_micro", expr(
          "CAST(round(CAST(dot AS DOUBLE) / (sqrt(CAST(an2 AS DOUBLE)) * " +
            "sqrt(CAST(bn2 AS DOUBLE))) * 1000000) AS BIGINT)"))
        .where(col("cos_micro") >= 999000)
        .groupBy(col("b_id"), col("cluster"))
        .agg(min("a_id").as("keep_id"), count(lit(1)).as("n_near"),
          max("cos_micro").as("max_cos_micro"))
        .select(col("b_id").as("dropped_id"), col("cluster"),
          col("keep_id"), col("n_near"), col("max_cos_micro"))
        .orderBy("dropped_id")
    },

    // SCALED SEMANTIC DEDUP WITH A LLOYD REFINEMENT (r14): the
    // exemplar-seeded tier above documents that "a Lloyd refinement
    // slots in front of the assignment unchanged" — this query IS
    // that code, so the claim is oracle-gated rather than prose. One
    // k-means half-step at the scaled cluster count: the BASE corpus
    // assigns to the nlist exemplar seeds (argmin exact BIGINT L2),
    // per-cluster INTEGER means (trunc-div — the vec_centroids fixed
    // point) become the refined centroids, and the final assignment
    // of the augmented corpus runs at those refined centroids —
    // centroids that now sit at their cells' centers of mass instead
    // of on arbitrary member vectors, the standard k-means tightening
    // (more rounds = trainCoarse's loop; one round is where the
    // marginal recall flattens on isotropic-noise clusters). Same
    // 0.999-cosine drop rule, planting, and output shape; every
    // quantity integer, so the whole two-phase clustering hash-matches
    // the oracle's replay. Scale shape adds ONE explode-aggregate
    // (the mean) and one more broadcast argmin over the base corpus —
    // both linear passes; the pair space stays Σ n_c² ≈ 100·n.
    "dedup_semantic_lloyd" -> QueryDef(
      s"""WITH f AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |nl AS (SELECT GREATEST(16, (COUNT(*) + 99) // 100) AS nlist FROM embeddings),
         |seeds AS MATERIALIZED (
         |  SELECT rn - 1 AS seed_id, fv AS sv,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS sn2
         |  FROM (SELECT vec_id, fv, ROW_NUMBER() OVER (
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM f), nl
         |  WHERE rn <= nl.nlist),
         |bq AS MATERIALIZED (
         |  SELECT vec_id AS id, fv,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS n2
         |  FROM f),
         |d0 AS (SELECT bq.id, seeds.seed_id,
         |         bq.n2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(list_zip(bq.fv, seeds.sv), p -> p[1] * p[2])),
         |           (a, x) -> a + x) AS BIGINT) + seeds.sn2 AS d2
         |       FROM bq, seeds),
         |asg0 AS MATERIALIZED (SELECT id, seed_id AS cluster FROM (
         |    SELECT id, seed_id,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, seed_id) AS rn
         |    FROM d0) WHERE rn = 1),
         |q AS (SELECT asg0.cluster, i AS dim, bq.fv[i+1] AS qv
         |      FROM bq JOIN asg0 USING (id), UNNEST(range(0, 64)) AS t(i)),
         |cent AS MATERIALIZED (
         |  SELECT cluster, dim, CAST(SUM(qv) AS BIGINT) // COUNT(*) AS m
         |  FROM q GROUP BY 1, 2),
         |aug AS MATERIALIZED (
         |  SELECT vec_id AS id, fv FROM f
         |  UNION ALL
         |  SELECT vec_id + ${VecQueries.PlantedIdOffset} AS id,
         |    list_prepend(fv[1] + (vec_id % 5) + 1, fv[2:64]) AS fv
         |  FROM f WHERE vec_id < 50),
         |aq AS (SELECT id, i AS dim, fv[i+1] AS qv
         |       FROM aug, UNNEST(range(0, 64)) AS t(i)),
         |dist AS (SELECT id, cluster, CAST(SUM((qv - m) * (qv - m)) AS BIGINT) AS d2
         |         FROM aq JOIN cent USING (dim) GROUP BY 1, 2),
         |asg AS (SELECT id, cluster FROM (
         |    SELECT id, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cluster) AS rn
         |    FROM dist) WHERE rn = 1),
         |av AS (SELECT id, fv,
         |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS n2
         |       FROM aug),
         |v AS (SELECT asg.id, asg.cluster, av.fv, av.n2
         |      FROM asg JOIN av USING (id)),
         |pr AS (SELECT a.id AS a_id, b.id AS b_id, a.cluster,
         |         CAST(round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(a.fv, b.fv), p -> p[1] * p[2])),
         |             (acc, x) -> acc + x) AS DOUBLE)
         |           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
         |           * 1000000) AS BIGINT) AS cos_micro
         |       FROM v a JOIN v b ON a.cluster = b.cluster AND a.id < b.id
         |       WHERE a.n2 > 0 AND b.n2 > 0)
         |SELECT b_id AS dropped_id, cluster, MIN(a_id) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_near, MAX(cos_micro) AS max_cos_micro
         |FROM pr WHERE cos_micro >= 999000
         |GROUP BY 1, 2 ORDER BY dropped_id""".stripMargin) { (s, d) =>
      import graft.functions.GraftExpressions.vec_dot
      val n = Tables.embeddings(s, d).count()
      val nlist = DerivedConstants.note("dedup_semantic_lloyd", "nlist",
        math.max(16L, (n + 99L) / 100L))
      val f = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      // two-phase exact-rank exemplar selection (bit-identical to the
      // oracle's global ROW_NUMBER, no single-partition corpus sort)
      val seeds = VecQueries.exemplarSeeds(f, nlist)
      // half-step 1: the BASE corpus assigns to the exemplar seeds.
      // repartition(id): fan-out parallelism must not inherit the
      // scan's byte-sized task layout (see dedup_semantic_scaled's av
      // comment); the exchange is reused by the centArr id-join below.
      val base = f.select(col("vec_id").as("id"), col("fv"))
        .withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      val asg0 = VecQueries.hashArgmin(
        base.withColumn("jk", col("id") % 1)
          .join(broadcast(seeds.withColumn("jk", col("seed_id") % 1)), "jk")
          .select(col("id"),
            (col("n2") - lit(2L) * vec_dot(col("fv"), col("sv")).cast("long") +
              col("sn2")).as("d2"),
            col("seed_id")),
        "id", "seed_id", "cluster")
      // refined centroids: per-cluster integer means, re-packed into
      // dim-ordered arrays for the codegen'd final argmin
      val centArr = base.join(asg0, "id")
        .select(col("cluster"), posexplode(col("fv")).as(Seq("dim", "qv")))
        .groupBy("cluster", "dim")
        .agg(expr("sum(qv) div count(1)").as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("cv"))
        .select(col("cluster").as("c_id"), col("cv"),
          vec_dot(col("cv"), col("cv")).cast("long").as("cn2"))
      val aug = f.select(col("vec_id").as("id"), col("fv"))
        .unionByName(f.where(col("vec_id") < 50)
          .select((col("vec_id") + VecQueries.PlantedIdOffset).as("id"),
            concat(
              array(element_at(col("fv"), 1) + (col("vec_id") % 5) + 1),
              slice(col("fv"), 2, 63)).as("fv")))
      // repartition(id): see dedup_semantic_scaled's av comment
      val av = aug.withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      // half-step 2: the augmented corpus assigns at the REFINED
      // centroids (n2 − 2·dot + |c|² == Σ(qv−m)² exactly, in integers)
      val asg = VecQueries.hashArgmin(
        av.withColumn("jk", col("id") % 1)
          .join(broadcast(centArr.withColumn("jk", col("c_id") % 1)), "jk")
          .select(col("id"),
            (col("n2") - lit(2L) * vec_dot(col("fv"), col("cv")).cast("long") +
              col("cn2")).as("d2"),
            col("c_id")),
        "id", "c_id", "cluster")
      val v = asg.join(av, "id")
      val a = v.select(col("id").as("a_id"), col("cluster"),
        col("fv").as("afv"), col("n2").as("an2"))
      val b = v.select(col("id").as("b_id"), col("cluster"),
        col("fv").as("bfv"), col("n2").as("bn2"))
      a.join(b, Seq("cluster"))
        .where(col("a_id") < col("b_id") && col("an2") > 0 && col("bn2") > 0)
        .withColumn("dot", vec_dot(col("afv"), col("bfv")).cast("long"))
        .withColumn("cos_micro", expr(
          "CAST(round(CAST(dot AS DOUBLE) / (sqrt(CAST(an2 AS DOUBLE)) * " +
            "sqrt(CAST(bn2 AS DOUBLE))) * 1000000) AS BIGINT)"))
        .where(col("cos_micro") >= 999000)
        .groupBy(col("b_id"), col("cluster"))
        .agg(min("a_id").as("keep_id"), count(lit(1)).as("n_near"),
          max("cos_micro").as("max_cos_micro"))
        .select(col("b_id").as("dropped_id"), col("cluster"),
          col("keep_id"), col("n_near"), col("max_cos_micro"))
        .orderBy("dropped_id")
    },

    // HIERARCHICAL SCALED SEMANTIC DEDUP (r15 — the r14 verdict's item
    // 2): dedup_semantic_scaled's flat assignment computes n·nlist
    // distances, and nlist grows as n/100 — the knob moved the
    // quadratic from the pair space into assignment (n²/100), and the
    // broadcast seed table grows linearly (~5 GB at 10⁹ vectors).
    // This tier applies the repo's own IVF trick to the SEED table:
    //   ncoarse = max(4, ⌈√nlist⌉) coarse ROUTERS — the first ncoarse
    //     exemplar seeds, refined by one Lloyd half-step over all
    //     nlist seeds (assign → per-cell integer means, the
    //     trainCoarse shape at seed granularity);
    //   every seed files under its nearest refined router (its CELL;
    //     probeable cells are exactly the non-empty ones, so a probed
    //     cell always holds candidates);
    //   every corpus vector scores only the ncoarse routers (top-2
    //     probed cells, ties → lowest cell), then runs the exact
    //     BIGINT argmin against the seeds of its probed cells only.
    // Assignment work: n·(√nlist + 2·nlist/√nlist) ≈ 3n·√(n/100)
    // — O(n^1.5/10) where the flat tier is O(n²/100); the broadcast
    // router table is √nlist rows (~3k at 10⁹ vectors) FOREVER, and
    // the per-cell seed join carries NO broadcast hint — stats
    // broadcast it while it fits and shuffle it on (cell) past that,
    // retiring the flat tier's linear broadcast growth. Probing is an
    // approximation exactly as in IVF: a vector's true nearest seed
    // may live outside its probed cells, but near-identical vectors
    // route identically, so near-dup pairs land in one cluster —
    // planted recall is pinned in VecSpec, and the oracle replays the
    // full two-level rule so every assignment is still hash-exact.
    // Everything integer (router means < 2^21, all distances < 2^53).
    "dedup_semantic_hier" -> QueryDef(
      s"""WITH f AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |nl AS (SELECT GREATEST(16, (COUNT(*) + 99) // 100) AS nlist,
         |         GREATEST(4, CAST(CEIL(SQRT(CAST(
         |           GREATEST(16, (COUNT(*) + 99) // 100) AS DOUBLE))) AS BIGINT))
         |           AS ncoarse
         |       FROM embeddings),
         |seeds AS MATERIALIZED (
         |  SELECT rn - 1 AS seed_id, fv AS sv,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS sn2
         |  FROM (SELECT vec_id, fv, ROW_NUMBER() OVER (
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM f), nl
         |  WHERE rn <= nl.nlist),
         |cex AS MATERIALIZED (
         |  SELECT seed_id AS x_id, sv AS xv, sn2 AS xn2 FROM seeds, nl
         |  WHERE seed_id < nl.ncoarse),
         |s2c0 AS MATERIALIZED (SELECT seed_id, x_id AS cell0 FROM (
         |    SELECT s.seed_id, cex.x_id,
         |      ROW_NUMBER() OVER (PARTITION BY s.seed_id ORDER BY
         |        s.sn2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(list_zip(s.sv, cex.xv), p -> p[1] * p[2])),
         |          (a, x) -> a + x) AS BIGINT) + cex.xn2,
         |        cex.x_id) AS rn
         |    FROM seeds s, cex) WHERE rn = 1),
         |ccd AS MATERIALIZED (
         |  SELECT cell0 AS cell, i AS dim,
         |    CAST(SUM(sv[i+1]) AS BIGINT) // COUNT(*) AS m
         |  FROM seeds JOIN s2c0 USING (seed_id), UNNEST(range(0, 64)) AS t(i)
         |  GROUP BY 1, 2),
         |cc AS MATERIALIZED (
         |  SELECT cell, list(m ORDER BY dim) AS cv,
         |    CAST(SUM(m * m) AS BIGINT) AS cn2
         |  FROM ccd GROUP BY 1),
         |scell AS MATERIALIZED (SELECT seed_id, cell FROM (
         |    SELECT s.seed_id, cc.cell,
         |      ROW_NUMBER() OVER (PARTITION BY s.seed_id ORDER BY
         |        s.sn2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(list_zip(s.sv, cc.cv), p -> p[1] * p[2])),
         |          (a, x) -> a + x) AS BIGINT) + cc.cn2,
         |        cc.cell) AS rn
         |    FROM seeds s, cc) WHERE rn = 1),
         |ncc AS MATERIALIZED (
         |  SELECT * FROM cc WHERE cell IN (SELECT cell FROM scell)),
         |aug AS MATERIALIZED (
         |  SELECT vec_id AS id, fv FROM f
         |  UNION ALL
         |  SELECT vec_id + ${VecQueries.PlantedIdOffset} AS id,
         |    list_prepend(fv[1] + (vec_id % 5) + 1, fv[2:64]) AS fv
         |  FROM f WHERE vec_id < 50),
         |av AS MATERIALIZED (SELECT id, fv,
         |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS n2
         |       FROM aug),
         |pr0 AS (SELECT av.id, ncc.cell,
         |          av.n2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list_transform(list_zip(av.fv, ncc.cv), p -> p[1] * p[2])),
         |            (a, x) -> a + x) AS BIGINT) + ncc.cn2 AS d2c
         |        FROM av, ncc),
         |probes AS MATERIALIZED (SELECT id, cell FROM (
         |    SELECT id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2c, cell) AS rn
         |    FROM pr0) WHERE rn <= 2),
         |cand AS (SELECT av.id, s.seed_id,
         |           av.n2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(av.fv, s.sv), p -> p[1] * p[2])),
         |             (a, x) -> a + x) AS BIGINT) + s.sn2 AS d2
         |         FROM probes
         |         JOIN av ON av.id = probes.id
         |         JOIN scell ON scell.cell = probes.cell
         |         JOIN seeds s ON s.seed_id = scell.seed_id),
         |asg AS MATERIALIZED (SELECT id, seed_id AS cluster FROM (
         |    SELECT id, seed_id,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, seed_id) AS rn
         |    FROM cand) WHERE rn = 1),
         |v AS (SELECT asg.id, asg.cluster, av.fv, av.n2
         |      FROM asg JOIN av USING (id)),
         |pr AS (SELECT a.id AS a_id, b.id AS b_id, a.cluster,
         |         CAST(round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(a.fv, b.fv), p -> p[1] * p[2])),
         |             (acc, x) -> acc + x) AS DOUBLE)
         |           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
         |           * 1000000) AS BIGINT) AS cos_micro
         |       FROM v a JOIN v b ON a.cluster = b.cluster AND a.id < b.id
         |       WHERE a.n2 > 0 AND b.n2 > 0)
         |SELECT b_id AS dropped_id, cluster, MIN(a_id) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_near, MAX(cos_micro) AS max_cos_micro
         |FROM pr WHERE cos_micro >= 999000
         |GROUP BY 1, 2 ORDER BY dropped_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.GraftExpressions.vec_dot
      val n = Tables.embeddings(s, d).count()
      val nlist = DerivedConstants.note("dedup_semantic_hier", "nlist",
        math.max(16L, (n + 99L) / 100L))
      val ncoarse = DerivedConstants.note("dedup_semantic_hier", "ncoarse",
        math.max(4L, math.ceil(math.sqrt(nlist.toDouble)).toLong))
      val f = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      // localCheckpoint: the iterative-loop rule — the seed table has
      // FIVE consumers below (cex, the cell half-step, the cell means,
      // scell, cellSeeds); unshared, every one re-runs the whole
      // two-phase seed scan (ProfSeeds prices one run at ~0.6 s of
      // stage overhead — ×5 was most of the tier's first-cut warm).
      // nlist rows of 64 longs: a deliberate bounded index artifact.
      val seeds = VecQueries.exemplarSeeds(f, nlist).pinned
      // coarse routers + seed→cell filing (hierRouters: the first
      // ncoarse exemplars, refined by one Lloyd half-step over all the
      // seeds, every seed filed under its nearest refined router)
      val (cc, scell) = VecQueries.hierRouters(seeds, ncoarse)
      // probeable cells = the non-empty ones (a probed cell always
      // holds candidate seeds)
      val ncc = cc.join(scell.select("cell").distinct(), "cell")
      val aug = f.select(col("vec_id").as("id"), col("fv"))
        .unionByName(f.where(col("vec_id") < 50)
          .select((col("vec_id") + VecQueries.PlantedIdOffset).as("id"),
            concat(
              array(element_at(col("fv"), 1) + (col("vec_id") % 5) + 1),
              slice(col("fv"), 2, 63)).as("fv")))
      // repartition(id): see dedup_semantic_scaled's av comment — the
      // router fan-out, probe rank, argmin, and the v join all reuse it
      val av = aug.withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      // the ROUTER pass: ncoarse distances per vector (√nlist rows
      // broadcast — ~3k at 10⁹ vectors), top-2 probed cells via an
      // id-PARTITIONED rank over the skinny (id, cell, d2c) relation
      val wProbe = Window.partitionBy("id").orderBy(col("d2c"), col("cell"))
      val probes = av.withColumn("jk", col("id") % 1)
        .join(broadcast(ncc.withColumn("jk", col("cell") % 1)), "jk")
        .select(col("id"),
          (col("n2") - lit(2L) * vec_dot(col("fv"), col("cv")).cast("long") +
            col("cn2")).as("d2c"),
          col("cell"))
        .withColumn("rn", row_number().over(wProbe))
        .where(col("rn") <= 2)
        .select("id", "cell")
      // exact argmin WITHIN probed cells only: the seed side joins on
      // its cell key with NO broadcast hint — stats broadcast it while
      // it fits, shuffle it on (cell) past that
      val cellSeeds = scell.join(seeds, "seed_id")
        .select(col("cell"), col("seed_id"), col("sv"), col("sn2"))
      val asg = VecQueries.hashArgmin(
        probes.join(av, "id")
          .join(cellSeeds, "cell")
          .select(col("id"),
            (col("n2") - lit(2L) * vec_dot(col("fv"), col("sv")).cast("long") +
              col("sn2")).as("d2"),
            col("seed_id")),
        "id", "seed_id", "cluster")
      val v = asg.join(av, "id")
      val a = v.select(col("id").as("a_id"), col("cluster"),
        col("fv").as("afv"), col("n2").as("an2"))
      val b = v.select(col("id").as("b_id"), col("cluster"),
        col("fv").as("bfv"), col("n2").as("bn2"))
      a.join(b, Seq("cluster"))
        .where(col("a_id") < col("b_id") && col("an2") > 0 && col("bn2") > 0)
        .withColumn("dot", vec_dot(col("afv"), col("bfv")).cast("long"))
        .withColumn("cos_micro", expr(
          "CAST(round(CAST(dot AS DOUBLE) / (sqrt(CAST(an2 AS DOUBLE)) * " +
            "sqrt(CAST(bn2 AS DOUBLE))) * 1000000) AS BIGINT)"))
        .where(col("cos_micro") >= 999000)
        .groupBy(col("b_id"), col("cluster"))
        .agg(min("a_id").as("keep_id"), count(lit(1)).as("n_near"),
          max("cos_micro").as("max_cos_micro"))
        .select(col("b_id").as("dropped_id"), col("cluster"),
          col("keep_id"), col("n_near"), col("max_cos_micro"))
        .orderBy("dropped_id")
    },

    // HIERARCHICAL LLOYD SEMANTIC DEDUP (r16 — the r15 verdict's item
    // 2): dedup_semantic_lloyd buys tighter clusters with a k-means
    // half-step, but BOTH its argmin passes assign flat — two n·nlist
    // sweeps, the scaling ladder's worst growth (3.89× per 3× data at
    // gen30). This tier routes BOTH passes through the hier routers:
    //   pass 1: the BASE corpus assigns to the nlist exemplar seeds
    //     via the router tier (ncoarse = ⌈√nlist⌉ router distances per
    //     vector, exact BIGINT argmin within the top-2 probed cells);
    //   Lloyd half-step: per-cluster integer means over that
    //     assignment become the refined centroids — UNCHANGED from
    //     the flat tier (the means aggregate never fans out);
    //   pass 2: the augmented corpus assigns to the REFINED centroids
    //     through the SAME routers — each refined centroid inherits
    //     its seed's cell (cluster ids ARE seed ids), probeable cells
    //     restrict to those holding ≥1 refined centroid (a cell whose
    //     seeds all lost pass 1 has no centroid — the non-empty-cell
    //     rule at centroid granularity, so every vector's probe finds
    //     candidates and the assignment stays total).
    // Assignment work: 2 router passes (n·√nlist each) + 2 probed-cell
    // argmins (~2n·nlist/√nlist each) ≈ 6n·√(n/100) — O(n^1.5/10)
    // where the flat Lloyd tier is 2n²/100; the router broadcast stays
    // √nlist rows FOREVER and both cell joins carry NO broadcast hint.
    // Probing approximates exactly as in the hier tier: near-identical
    // vectors route identically, so near-dup pairs still co-assign —
    // planted recall pinned in VecSpec, and the oracle replays the
    // full two-level rule for both passes so every assignment is
    // hash-exact. Everything integer (means < 2^21, distances < 2^53).
    "dedup_semantic_lloyd_hier" -> QueryDef(
      s"""WITH f AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |nl AS (SELECT GREATEST(16, (COUNT(*) + 99) // 100) AS nlist,
         |         GREATEST(4, CAST(CEIL(SQRT(CAST(
         |           GREATEST(16, (COUNT(*) + 99) // 100) AS DOUBLE))) AS BIGINT))
         |           AS ncoarse
         |       FROM embeddings),
         |seeds AS MATERIALIZED (
         |  SELECT rn - 1 AS seed_id, fv AS sv,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS sn2
         |  FROM (SELECT vec_id, fv, ROW_NUMBER() OVER (
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM f), nl
         |  WHERE rn <= nl.nlist),
         |cex AS MATERIALIZED (
         |  SELECT seed_id AS x_id, sv AS xv, sn2 AS xn2 FROM seeds, nl
         |  WHERE seed_id < nl.ncoarse),
         |s2c0 AS MATERIALIZED (SELECT seed_id, x_id AS cell0 FROM (
         |    SELECT s.seed_id, cex.x_id,
         |      ROW_NUMBER() OVER (PARTITION BY s.seed_id ORDER BY
         |        s.sn2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(list_zip(s.sv, cex.xv), p -> p[1] * p[2])),
         |          (a, x) -> a + x) AS BIGINT) + cex.xn2,
         |        cex.x_id) AS rn
         |    FROM seeds s, cex) WHERE rn = 1),
         |ccd AS MATERIALIZED (
         |  SELECT cell0 AS cell, i AS dim,
         |    CAST(SUM(sv[i+1]) AS BIGINT) // COUNT(*) AS m
         |  FROM seeds JOIN s2c0 USING (seed_id), UNNEST(range(0, 64)) AS t(i)
         |  GROUP BY 1, 2),
         |cc AS MATERIALIZED (
         |  SELECT cell, list(m ORDER BY dim) AS cv,
         |    CAST(SUM(m * m) AS BIGINT) AS cn2
         |  FROM ccd GROUP BY 1),
         |scell AS MATERIALIZED (SELECT seed_id, cell FROM (
         |    SELECT s.seed_id, cc.cell,
         |      ROW_NUMBER() OVER (PARTITION BY s.seed_id ORDER BY
         |        s.sn2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(list_zip(s.sv, cc.cv), p -> p[1] * p[2])),
         |          (a, x) -> a + x) AS BIGINT) + cc.cn2,
         |        cc.cell) AS rn
         |    FROM seeds s, cc) WHERE rn = 1),
         |ncc AS MATERIALIZED (
         |  SELECT * FROM cc WHERE cell IN (SELECT cell FROM scell)),
         |bq AS MATERIALIZED (
         |  SELECT vec_id AS id, fv,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS n2
         |  FROM f),
         |pr0a AS (SELECT bq.id, ncc.cell,
         |           bq.n2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(bq.fv, ncc.cv), p -> p[1] * p[2])),
         |             (a, x) -> a + x) AS BIGINT) + ncc.cn2 AS d2c
         |         FROM bq, ncc),
         |probes1 AS MATERIALIZED (SELECT id, cell FROM (
         |    SELECT id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2c, cell) AS rn
         |    FROM pr0a) WHERE rn <= 2),
         |cand1 AS (SELECT bq.id, s.seed_id,
         |            bq.n2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |              list_transform(list_zip(bq.fv, s.sv), p -> p[1] * p[2])),
         |              (a, x) -> a + x) AS BIGINT) + s.sn2 AS d2
         |          FROM probes1
         |          JOIN bq ON bq.id = probes1.id
         |          JOIN scell ON scell.cell = probes1.cell
         |          JOIN seeds s ON s.seed_id = scell.seed_id),
         |asg0 AS MATERIALIZED (SELECT id, seed_id AS cluster FROM (
         |    SELECT id, seed_id,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, seed_id) AS rn
         |    FROM cand1) WHERE rn = 1),
         |q AS (SELECT asg0.cluster, i AS dim, bq.fv[i+1] AS qv
         |      FROM bq JOIN asg0 USING (id), UNNEST(range(0, 64)) AS t(i)),
         |centd AS MATERIALIZED (
         |  SELECT cluster, dim, CAST(SUM(qv) AS BIGINT) // COUNT(*) AS m
         |  FROM q GROUP BY 1, 2),
         |centcell AS MATERIALIZED (
         |  SELECT scell.cell, c.cluster AS c_id, c.cv,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(c.cv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS ccn2
         |  FROM (SELECT cluster, list(m ORDER BY dim) AS cv
         |        FROM centd GROUP BY 1) c
         |  JOIN scell ON scell.seed_id = c.cluster),
         |ncc2 AS MATERIALIZED (
         |  SELECT * FROM cc WHERE cell IN (SELECT cell FROM centcell)),
         |aug AS MATERIALIZED (
         |  SELECT vec_id AS id, fv FROM f
         |  UNION ALL
         |  SELECT vec_id + ${VecQueries.PlantedIdOffset} AS id,
         |    list_prepend(fv[1] + (vec_id % 5) + 1, fv[2:64]) AS fv
         |  FROM f WHERE vec_id < 50),
         |av AS MATERIALIZED (SELECT id, fv,
         |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(fv, x -> x * x)), (a, x) -> a + x) AS BIGINT) AS n2
         |       FROM aug),
         |pr0b AS (SELECT av.id, ncc2.cell,
         |           av.n2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(av.fv, ncc2.cv), p -> p[1] * p[2])),
         |             (a, x) -> a + x) AS BIGINT) + ncc2.cn2 AS d2c
         |         FROM av, ncc2),
         |probes2 AS MATERIALIZED (SELECT id, cell FROM (
         |    SELECT id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2c, cell) AS rn
         |    FROM pr0b) WHERE rn <= 2),
         |cand2 AS (SELECT av.id, centcell.c_id,
         |            av.n2 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |              list_transform(list_zip(av.fv, centcell.cv), p -> p[1] * p[2])),
         |              (a, x) -> a + x) AS BIGINT) + centcell.ccn2 AS d2
         |          FROM probes2
         |          JOIN av ON av.id = probes2.id
         |          JOIN centcell ON centcell.cell = probes2.cell),
         |asg AS MATERIALIZED (SELECT id, c_id AS cluster FROM (
         |    SELECT id, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, c_id) AS rn
         |    FROM cand2) WHERE rn = 1),
         |v AS (SELECT asg.id, asg.cluster, av.fv, av.n2
         |      FROM asg JOIN av USING (id)),
         |pr AS (SELECT a.id AS a_id, b.id AS b_id, a.cluster,
         |         CAST(round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(list_zip(a.fv, b.fv), p -> p[1] * p[2])),
         |             (acc, x) -> acc + x) AS DOUBLE)
         |           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
         |           * 1000000) AS BIGINT) AS cos_micro
         |       FROM v a JOIN v b ON a.cluster = b.cluster AND a.id < b.id
         |       WHERE a.n2 > 0 AND b.n2 > 0)
         |SELECT b_id AS dropped_id, cluster, MIN(a_id) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_near, MAX(cos_micro) AS max_cos_micro
         |FROM pr WHERE cos_micro >= 999000
         |GROUP BY 1, 2 ORDER BY dropped_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.GraftExpressions.vec_dot
      val n = Tables.embeddings(s, d).count()
      val nlist = DerivedConstants.note("dedup_semantic_lloyd_hier", "nlist",
        math.max(16L, (n + 99L) / 100L))
      val ncoarse = DerivedConstants.note("dedup_semantic_lloyd_hier", "ncoarse",
        math.max(4L, math.ceil(math.sqrt(nlist.toDouble)).toLong))
      val f = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      // localCheckpoint: the seed table has five consumers (router
      // machinery ×3, cand1's cellSeeds, and through scell the
      // centroid filing) — see dedup_semantic_hier's comment
      val seeds = VecQueries.exemplarSeeds(f, nlist).pinned
      val (cc, scell) = VecQueries.hierRouters(seeds, ncoarse)
      val ncc = cc.join(scell.select("cell").distinct(), "cell")
      val aug = f.select(col("vec_id").as("id"), col("fv"))
        .unionByName(f.where(col("vec_id") < 50)
          .select((col("vec_id") + VecQueries.PlantedIdOffset).as("id"),
            concat(
              array(element_at(col("fv"), 1) + (col("vec_id") % 5) + 1),
              slice(col("fv"), 2, 63)).as("fv")))
      // repartition(id): see dedup_semantic_scaled's av comment — the
      // router fan-outs, probe ranks, argmins, means, and the v join
      // all reuse the id exchange
      val av = aug.withColumn("n2", vec_dot(col("fv"), col("fv")).cast("long"))
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      // the BASE corpus is av minus the planted high-bit slice — ONE
      // quantize+exchange serves both passes instead of two scans
      val bq = av.where(col("id") < VecQueries.PlantedIdOffset)
      val wProbe = Window.partitionBy("id").orderBy(col("d2c"), col("cell"))
      // pass-1 router probe: the BASE corpus scores the √nlist routers
      val probes1 = bq.withColumn("jk", col("id") % 1)
        .join(broadcast(ncc.withColumn("jk", col("cell") % 1)), "jk")
        .select(col("id"),
          (col("n2") - lit(2L) * vec_dot(col("fv"), col("cv")).cast("long") +
            col("cn2")).as("d2c"),
          col("cell"))
        .withColumn("rn", row_number().over(wProbe))
        .where(col("rn") <= 2)
        .select("id", "cell")
      // pass-1 exact argmin within probed cells (unhinted cell join)
      val cellSeeds = scell.join(seeds, "seed_id")
        .select(col("cell"), col("seed_id"), col("sv"), col("sn2"))
      val asg0 = VecQueries.hashArgmin(
        probes1.join(bq, "id")
          .join(cellSeeds, "cell")
          .select(col("id"),
            (col("n2") - lit(2L) * vec_dot(col("fv"), col("sv")).cast("long") +
              col("sn2")).as("d2"),
            col("seed_id")),
        "id", "seed_id", "cluster")
      // Lloyd half-step: per-cluster integer means (trunc-div), each
      // refined centroid inheriting its seed's cell.
      // localCheckpoint: the iterative-loop rule — centCell has THREE
      // consumers below (ncc2, pass-2's probe restriction, cand2's
      // cell join); unshared, every one re-runs the ENTIRE pass-1
      // assignment (router probe + probed-cell argmin over the whole
      // corpus) — the first cut of this tier executed pass 1 three
      // times and read 12.15 s at sf0.1 where flat Lloyd reads 4.19.
      // nlist rows of 64 longs: a deliberate bounded index artifact.
      val centCell = bq.join(asg0, "id")
        .select(col("cluster"), posexplode(col("fv")).as(Seq("dim", "qv")))
        .groupBy("cluster", "dim")
        .agg(expr("sum(qv) div count(1)").as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("cv"))
        .select(col("cluster").as("c_id"), col("cv"),
          vec_dot(col("cv"), col("cv")).cast("long").as("ccn2"))
        .join(scell.withColumnRenamed("seed_id", "c_id"), "c_id")
        // LAZY checkpoint: eager would run pass 1 in a separate
        // action, recomputing av's scan+exchange for pass 2 (jobs
        // don't share shuffles across actions — measured +50% at
        // gen10); lazy materializes inside the main action, where
        // av's exchange is reused by both passes
        .localCheckpoint(eager = false)
      // probeable cells at CENTROID granularity: a cell whose seeds
      // all lost pass 1 has no refined centroid — drop it so pass 2's
      // probe always finds candidates
      val ncc2 = cc.join(centCell.select("cell").distinct(), "cell")
      // pass-2 router probe: the AUGMENTED corpus scores the routers
      val probes2 = av.withColumn("jk", col("id") % 1)
        .join(broadcast(ncc2.withColumn("jk", col("cell") % 1)), "jk")
        .select(col("id"),
          (col("n2") - lit(2L) * vec_dot(col("fv"), col("cv")).cast("long") +
            col("cn2")).as("d2c"),
          col("cell"))
        .withColumn("rn", row_number().over(wProbe))
        .where(col("rn") <= 2)
        .select("id", "cell")
      // pass-2 exact argmin at the refined centroids of probed cells
      val asg = VecQueries.hashArgmin(
        probes2.join(av, "id")
          .join(centCell, "cell")
          .select(col("id"),
            (col("n2") - lit(2L) * vec_dot(col("fv"), col("cv")).cast("long") +
              col("ccn2")).as("d2"),
            col("c_id")),
        "id", "c_id", "cluster")
      val v = asg.join(av, "id")
      val a = v.select(col("id").as("a_id"), col("cluster"),
        col("fv").as("afv"), col("n2").as("an2"))
      val b = v.select(col("id").as("b_id"), col("cluster"),
        col("fv").as("bfv"), col("n2").as("bn2"))
      a.join(b, Seq("cluster"))
        .where(col("a_id") < col("b_id") && col("an2") > 0 && col("bn2") > 0)
        .withColumn("dot", vec_dot(col("afv"), col("bfv")).cast("long"))
        .withColumn("cos_micro", expr(
          "CAST(round(CAST(dot AS DOUBLE) / (sqrt(CAST(an2 AS DOUBLE)) * " +
            "sqrt(CAST(bn2 AS DOUBLE))) * 1000000) AS BIGINT)"))
        .where(col("cos_micro") >= 999000)
        .groupBy(col("b_id"), col("cluster"))
        .agg(min("a_id").as("keep_id"), count(lit(1)).as("n_near"),
          max("cos_micro").as("max_cos_micro"))
        .select(col("b_id").as("dropped_id"), col("cluster"),
          col("keep_id"), col("n_near"), col("max_cos_micro"))
        .orderBy("dropped_id")
    },

    // SEMANTIC DECONTAMINATION — the embedding-space twin of
    // decontaminate_ngram: n-gram overlap misses a benchmark item
    // that was paraphrased or re-tokenized into the training set, but
    // its embedding still sits at ~1.0 cosine. The benchmark set
    // (vec_id < 20 — eval sets are small by nature, the bounded
    // broadcast side by contract) broadcasts into ONE streamed scan
    // of the training corpus; every (train, bench) pair above 0.95
    // cosine is reported for removal. Exact 2^-20 fixed-point BIGINT
    // dots with the one grid-rounded double sequence at the end, so
    // the report is hash-exact. Random embeddings never reach 0.95,
    // so leaked copies (jittered, high-bit ids) are planted for the
    // 20 benchmark vectors — 20 live contamination rows at any SF.
    // At corpus scale the same broadcast survives (the bench side
    // stays small); a benchmark too large to broadcast feeds the
    // LSH/IVF candidate tiers into this same exact verifier.
    "decontaminate_embedding" -> QueryDef(
      s"""WITH f AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS fv
         |  FROM embeddings),
         |bench AS (SELECT vec_id AS bench_id, fv AS bv FROM f WHERE vec_id < 20),
         |train AS (
         |  SELECT vec_id AS train_id, fv FROM f WHERE vec_id >= 20
         |  UNION ALL
         |  SELECT vec_id + ${VecQueries.PlantedIdOffset} AS train_id,
         |    list_prepend(fv[1] + (vec_id % 5) + 1, fv[2:64]) AS fv
         |  FROM f WHERE vec_id < 20),
         |scored AS (
         |  SELECT t.train_id, b.bench_id,
         |    CAST(round(CAST(list_sum(list_transform(range(64),
         |        i -> t.fv[i+1] * b.bv[i+1])) AS DOUBLE)
         |      / (sqrt(CAST(list_sum(list_transform(t.fv, x -> x * x)) AS DOUBLE))
         |         * sqrt(CAST(list_sum(list_transform(b.bv, x -> x * x)) AS DOUBLE)))
         |      * 1000000) AS BIGINT) AS cos_micro
         |  FROM train t, bench b)
         |SELECT train_id, bench_id, cos_micro FROM scored
         |WHERE cos_micro >= 950000
         |ORDER BY train_id, bench_id""".stripMargin) { (s, d) =>
      val f = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1048576d).cast("long")).as("fv"))
      val bench = f.where(col("vec_id") < 20)
        .select(col("vec_id").as("bench_id"), col("fv").as("bv"))
      val train = f.where(col("vec_id") >= 20)
        .select(col("vec_id").as("train_id"), col("fv"))
        .unionByName(f.where(col("vec_id") < 20)
          .select((col("vec_id") + VecQueries.PlantedIdOffset).as("train_id"),
            concat(
              array(element_at(col("fv"), 1) + (col("vec_id") % 5) + 1),
              slice(col("fv"), 2, 63)).as("fv")))
      train.crossJoin(broadcast(bench))
        .withColumn("dot",
          graft.functions.GraftExpressions.vec_dot(col("fv"), col("bv")).cast("long"))
        .withColumn("tn2",
          graft.functions.GraftExpressions.vec_dot(col("fv"), col("fv")).cast("long"))
        .withColumn("bn2",
          graft.functions.GraftExpressions.vec_dot(col("bv"), col("bv")).cast("long"))
        .withColumn("cos_micro", expr(
          "CAST(round(CAST(dot AS DOUBLE) / (sqrt(CAST(tn2 AS DOUBLE)) * " +
            "sqrt(CAST(bn2 AS DOUBLE))) * 1000000) AS BIGINT)"))
        .where(col("cos_micro") >= 950000)
        .select("train_id", "bench_id", "cos_micro")
        .orderBy("train_id", "bench_id")
    },

    // IVF-bucketed ANN top-5 (the scale path the LSH variant's sibling):
    // engine-built centroids, so rows-only; recall vs brute force
    // pinned in VecSpec
    "sim_ivf_topk" -> QueryDef.rowsOnly { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      VecFunctions.ivfTopK(queries, corpus, nLists = 16, nProbe = 4, k = 5,
          cacheKey = Some(s"emb:$d"))
        .orderBy("q_id", "rank")
    },

    // int8 scalar quantization of unit-normalized embeddings (the
    // compression step before a memory-resident ANN index at scale:
    // 4x smaller vectors, reconstruction bounded by 1/254) + the exact
    // per-vector max reconstruction error. round() is half-away-from-
    // zero in both engines; abs/max/division are exact.
    "vec_quantize_int8" -> QueryDef(
      """SELECT vec_id,
        |  md5(array_to_string(list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 127.0) AS BIGINT)), ',')) AS q8_digest,
        |  round(list_aggregate(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * 127.0) / 127.0)), 'max'), 9) AS max_err
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      // the quantized vector itself is array-typed, which the driver's
      // pandas compare can't sort — project an md5 digest of the joined
      // int8 codes instead (bit-exact both sides: round-half-away +
      // BIGINT rendering are identical in Spark and DuckDB)
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          md5(concat_ws(",", transform(col("embedding"),
            x => round(x.cast("double") * 127.0, 0).cast("long").cast("string"))))
            .as("q8_digest"),
          round(array_max(transform(col("embedding"),
            x => abs(x.cast("double") - round(x.cast("double") * 127.0, 0) / 127.0))), 9)
            .as("max_err"))
        .orderBy("vec_id")
    },

    // array higher-order functions over the embedding column: squared-
    // l2 fold (transform+aggregate, left-to-right — identical fp bits
    // to DuckDB's list fold) and a lambda filter count
    "vec_array_norm" -> QueryDef(
      """SELECT vec_id,
        |  sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS l2,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)).as("l2"),
          size(filter(col("embedding"), x => x > lit(0f))).cast("long").as("n_pos"))
        .orderBy("vec_id")
    },

    // MUTUAL k-NN GRAPH — undirected edges (a, b) where each vector
    // sits in the OTHER's exact cosine top-5: the symmetric-neighbor
    // graph that seeds density clustering (HDBSCAN-style) and
    // semantic-dedup communities, and the natural bridge from the
    // vec family into the graph family. Bounded to vec_id < 300 —
    // the brute-force verify-tier convention (the LSH/IVF tiers are
    // the candidate generators at scale; this is the exact method a
    // bucketed candidate set feeds). One broadcast of the bounded
    // query set into a corpus scan, one per-query top-k window, then
    // a self-join on reversed (q, id) pairs keeps mutual edges once
    // (a < b).
    "sim_mutual_knn" -> QueryDef(
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
         |           FROM embeddings WHERE vec_id < 300),
         |scored AS (
         |  SELECT q.q_id, c.vec_id AS id,
         |    ${VecFunctions.cosineSql("q.q_vec", "c.embedding")} AS sim
         |  FROM embeddings c, q
         |  WHERE c.vec_id < 300 AND q.q_id <> c.vec_id),
         |ranked AS (
         |  SELECT q_id, id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, id) AS rank
         |  FROM scored),
         |knn AS (SELECT q_id, id, sim FROM ranked WHERE rank <= 5)
         |SELECT x.q_id AS a, x.id AS b, round(x.sim, 9) AS sim
         |FROM knn x JOIN knn y ON y.q_id = x.id AND y.id = x.q_id
         |WHERE x.q_id < x.id
         |ORDER BY a, b""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).where(col("vec_id") < 300)
      val queries = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val knn = VecFunctions.bruteForceTopK(queries, corpus, k = 5)
        .select("q_id", "id", "sim")
        .pinned // both sides of the mutual self-join
      knn.as("x").join(knn.as("y"),
          col("y.q_id") === col("x.id") && col("y.id") === col("x.q_id"))
        .where(col("x.q_id") < col("x.id"))
        .select(col("x.q_id").as("a"), col("x.id").as("b"),
          round(col("x.sim"), 9).as("sim"))
        .orderBy("a", "b")
    },

    // PCA TOP COMPONENT by distributed covariance + power iteration —
    // the whitening / dimensionality-reduction primitive (Matryoshka
    // truncation keeps prefix dims; PCA finds the BEST single
    // direction). Everything is exact integer fixed point, so the
    // whole pipeline is hash-gated, not pinned: coordinates quantize
    // to 2^-10, the covariance assembles from one (i, j) co-moment
    // aggregate via the computational identity n*E[xy] - E[x]E[y]
    // (per-term truncating division, identical both engines), and
    // five unrolled power-iteration rounds renormalize by the
    // infinity norm — a pure-integer normalizer (u div (max|u| div
    // 1e6 + 1)) chosen so no intermediate clears 2^60. Scale shape:
    // the co-moment aggregate is ONE shuffle of n*d^2 partial-agged
    // products; the 4096-row covariance and 64-row state vector then
    // iterate entirely in broadcast land. Bound sanity at 100x data:
    // sum f_i*f_j <= (4*2^10)^2 * n — BIGINT-safe past 1e11 vectors.
    "vec_pca_power" -> QueryDef(
      s"""$PcaCteSql
         |SELECT v5.i AS dim, v5.x AS v_munit, m5.mx AS growth
         |FROM v5, m5 ORDER BY dim""".stripMargin) { (s, d) =>
      val (_, v, lastU) = pcaPower(s, d)
      v.crossJoin(broadcast(lastU.select(col("mx").as("growth"))))
        .select(col("i").as("dim"), col("x").as("v_munit"), col("growth"))
        .orderBy("dim")
    },

    // PCA PROJECTION — every embedding scored along the learned top
    // component: the dimensionality-reduction APPLICATION (1-D
    // semantic axis for binning, drift monitoring, or coarse
    // clustering), proving the component is usable, not just
    // computable. Projection = one broadcast of the 64-row component
    // onto the quantized frame + a per-vector partial-agg dot product
    // — exact integers end to end, so the full train-then-apply
    // pipeline is hash-gated. Top-20 by projection with the label
    // riding along.
    "vec_pca_project" -> QueryDef(
      s"""$PcaCteSql,
         |proj AS (
         |  SELECT fx.vec_id, CAST(SUM(fx.f * v5.x) AS BIGINT) AS pr
         |  FROM fx JOIN v5 ON fx.i = v5.i GROUP BY 1)
         |SELECT e.vec_id, e.label, CAST(proj.pr // 1024 AS BIGINT) AS proj_munit
         |FROM proj JOIN embeddings e ON e.vec_id = proj.vec_id
         |ORDER BY proj_munit DESC, e.vec_id LIMIT 20""".stripMargin) { (s, d) =>
      val (fx, v, _) = pcaPower(s, d)
      val proj = fx
        .join(broadcast(v.select(col("i"), col("x"))), "i")
        .groupBy("vec_id").agg(sum(expr("f * x")).as("pr"))
      proj.join(Tables.embeddings(s, d).select("vec_id", "label"), "vec_id")
        .select(col("vec_id"), col("label"),
          expr("CAST(pr div 1024 AS BIGINT)").as("proj_munit"))
        .orderBy(col("proj_munit").desc, col("vec_id"))
        .limit(20)
    }
  )
}
