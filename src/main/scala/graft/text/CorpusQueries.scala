package graft.text
import graft.Pinned.PinnedOps

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import TextFunctions._

/** Round-5 corpus-preparation operators: lexical retrieval scoring
  * (BM25), token-distribution entropy, sequence packing, and
  * temperature-scaled domain mixing — the steps between "filtered
  * documents" and "training batches" in an LLM data pipeline.
  *
  * Determinism: entropy and the mixing allocation compute in integer
  * fixed-point (micro-nats / per-mille weights) so sums and floors are
  * partition-order independent; BM25 is a single fixed IEEE op
  * sequence per row rounded to 9 dp (ln is the one libm call — see
  * the boundary-distance check in R5OpsSpec).
  */
object CorpusQueries {

  /** Shared BM25 per-term formula (k1=1.2, b=0.75), written once and
    * fed verbatim to BOTH engines so the op sequence is identical.
    * Expects columns: n (corpus size), df_i, tf_i, dl, avgdl.
    */
  private def bm25Term(i: Int): String =
    s"ln((n - df$i + 0.5)/(df$i + 0.5) + 1.0) * " +
      s"(tf$i*2.2)/(tf$i + 1.2*(0.25 + 0.75*dl/avgdl))"
  private val bm25Score: String =
    s"round(${bm25Term(1)} + ${bm25Term(2)} + ${bm25Term(3)}, 9)"
  private val bm25Terms = Seq("batch", "index", "shuffle")

  /** The DSIR training pass, shared by every family member so the
    * arithmetic exists ONCE: returns (dc, lr) where dc is the
    * per-(doc, lang, bucket) count table and lr the trained 256-row
    * model (add-1-smoothed target-vs-raw log-likelihood ratio
    * pre-rounded to the 1e-6 grid — see text_dsir for the full
    * contract). dc is localCheckpoint()ed: it feeds BOTH the model fit
    * and the scoring probe side, and unpinned the tokenize+md5 corpus
    * pass re-executes once per consumer (~3x per run — observed in
    * review). Size bound: O(docs x min(doc vocab, 256)) aggregate
    * rows, never raw tokens; the 100 TB substitute is
    * persist(DISK_ONLY) (same policy as the levenshtein shingle
    * table), and the harness sweeps the blocks after each query
    * (RddHygiene).
    *
    * `pin = false` (the model-only path, [[dsirModel]]): dc has a
    * single downstream consumer, so the checkpoint would buy nothing
    * and cost a full tokenize+hash materialization plus blocks that
    * only the harness sweep reclaims — direct callers (tests,
    * notebooks) would accumulate them until GC.
    */
  private[graft] def dsirParts(
      s: org.apache.spark.sql.SparkSession, d: String, pin: Boolean = true)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val dc0 = graft.Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"), bucketCol.as("bucket"))
      .groupBy("doc_id", "lang", "bucket").agg(count(lit(1)).as("n"))
    val dc = if (pin) dc0.pinned else dc0
    val bs = dc.groupBy("bucket").agg(
      sum("n").as("rc"),
      sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("tc"))
    val lr = bs.crossJoin(broadcast(bs.agg(
        sum("rc").as("rtot"), sum("tc").as("ttot"))))
      .select(col("bucket"), expr(
        """CAST(round(ln(
          |  (CAST(tc + 1 AS DOUBLE) * CAST(rtot + 256 AS DOUBLE)) /
          |  (CAST(rc + 1 AS DOUBLE) * CAST(ttot + 256 AS DOUBLE))
          |) * 1000000) AS BIGINT)""".stripMargin).as("lr_micro"))
    (dc, lr)
  }

  /** The trained model alone — the artifact streaming_dsir_gate
    * broadcasts into a document stream.
    */
  private[graft] def dsirModel(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = dsirParts(s, d, pin = false)._2

  /** The md5 hashed-feature bucket (mirrors text_hashed_features). */
  private[graft] def bucketCol: org.apache.spark.sql.Column =
    expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % 256")

  /** One unrolled BPE round as oracle CTEs (see text_bpe_train): pair
    * counts over the current segmentation, argmax rule, then the
    * GREEDY left-to-right merge replayed via the parity trick —
    * overlapping matches only occur in same-symbol runs, where greedy
    * merges exactly the odd-ranked positions of each consecutive-match
    * run (ROW_NUMBER parity), so the window-based replay is
    * bit-identical to the sequential fold.
    */
  private def bpeRoundSql(r: Int): String = {
    val p = s"s${r - 1}"
    s"""p$r AS MATERIALIZED (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
       |       FROM $p, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
       |r$r AS MATERIALIZED (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
       |m$r AS MATERIALIZED (SELECT t.word, u.i FROM $p t, UNNEST(range(1, len(t.syms))) AS u(i), r$r
       |       WHERE t.syms[u.i] = r$r.a AND t.syms[u.i+1] = r$r.b),
       |g$r AS MATERIALIZED (SELECT word, i, i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS grp
       |        FROM m$r),
       |k$r AS MATERIALIZED (SELECT word, i FROM (
       |        SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY i) AS rn
       |        FROM g$r) WHERE rn % 2 = 1),
       |pos$r AS MATERIALIZED (SELECT word, freq, u.j, syms[u.j] AS s
       |          FROM $p, UNNEST(range(1, len(syms)+1)) AS u(j)),
       |s$r AS MATERIALIZED (SELECT p.word, ANY_VALUE(p.freq) AS freq,
       |         list(CASE WHEN km.i IS NOT NULL THEN (SELECT a || b FROM r$r)
       |              ELSE p.s END ORDER BY p.j) AS syms
       |       FROM pos$r p
       |       LEFT JOIN k$r km ON km.word = p.word AND km.i = p.j
       |       LEFT JOIN k$r kp ON kp.word = p.word AND kp.i = p.j - 1
       |       WHERE kp.i IS NULL
       |       GROUP BY p.word)""".stripMargin
  }

  private val bpeTrainOracle: String =
    s"""WITH w AS (
       |  SELECT unnest(${tokensSql("text")}) AS word FROM documents),
       |v AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM w WHERE length(word) >= 2 GROUP BY 1),
       |s0 AS MATERIALIZED (SELECT word, freq,
       |         list_transform(range(1, length(word)+1), i -> word[i]) AS syms
       |       FROM v),
       |${(1 to 5).map(bpeRoundSql).mkString(",\n")}
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS round, a, b, cnt FROM r1 UNION ALL
       |  SELECT 2, a, b, cnt FROM r2 UNION ALL
       |  SELECT 3, a, b, cnt FROM r3 UNION ALL
       |  SELECT 4, a, b, cnt FROM r4 UNION ALL
       |  SELECT 5, a, b, cnt FROM r5)
       |ORDER BY round""".stripMargin

  /** The trained-vocab CTE chain (through `vl`: word -> symbol count
    * after 5 merges) shared by the encode and streaming-gate oracles.
    */
  private[graft] val bpeVocabCte: String =
    bpeTrainOracle.substring(0, bpeTrainOracle.indexOf("\nSELECT * FROM (")) +
      ",\nvl AS MATERIALIZED (SELECT word, CAST(len(syms) AS BIGINT) AS n_syms FROM s5)"

  /** The BPE trainer body (see the text_bpe_train scaladoc for the
    * scale rationale): word-frequency compression, then per round a
    * pair-frequency aggregate -> argmax rule -> GREEDY left-to-right
    * merge as a columnar `aggregate` fold (exactly the sequential
    * semantics: a fresh merge output can immediately participate in
    * the next comparison, so same-symbol runs like "aaaa" pair up
    * [aa, aa] — pinned against a hand reference in
    * TextFunctionsSpec). Exposed for the spec; the query fixes
    * rounds = 5.
    */
  private[graft] def bpeTrain(
      docs: org.apache.spark.sql.DataFrame, rounds: Int)
      : org.apache.spark.sql.DataFrame = {
    val (rules, _) = bpeRounds(docs, rounds)
    rules.reduce(_ unionByName _)
      .select(col("round"), col("a"), col("b"), col("cnt"))
      .orderBy("round")
  }

  /** The trained segmentation itself — (word, syms) after `rounds`
    * merges — the artifact text_bpe_encode broadcasts onto the corpus.
    */
  private[graft] def bpeSegmentation(
      docs: org.apache.spark.sql.DataFrame, rounds: Int)
      : org.apache.spark.sql.DataFrame =
    bpeRounds(docs, rounds)._2.select(col("word"), col("syms"))

  private def bpeRounds(
      docs: org.apache.spark.sql.DataFrame, rounds: Int)
      : (Seq[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame) = {
    var seg = docs
      .select(explode(tokens(col("text"))).as("word"))
      .where(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
          .as("syms"))
      .pinned
    val rules = (1 to rounds).map { r =>
      val rule = seg.where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms)-2), " +
            "i -> named_struct('a', syms[i], 'b', syms[i+1]))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .pinned // consumed twice: output row + the merge below
      seg = seg
        .crossJoin(broadcast(rule.select(col("a").as("ma"), col("b").as("mb"))))
        .select(col("word"), col("freq"), expr(
          """aggregate(syms, CAST(array() AS ARRAY<STRING>),
            |  (acc, x) -> CASE WHEN size(acc) > 0 THEN
            |    CASE WHEN element_at(acc, -1) = ma AND x = mb
            |      THEN concat(slice(acc, 1, size(acc) - 1), array(concat(ma, mb)))
            |      ELSE concat(acc, array(x)) END
            |    ELSE array(x) END)""".stripMargin).as("syms"))
        .pinned // consumed twice: next round's stats + merge
      rule.withColumn("round", lit(r.toLong))
    }
    (rules, seg)
  }

  val defs: Map[String, QueryDef] = Map(

    // BPE TOKENIZER TRAINING — the real iterative loop (Sennrich et
    // al. 2016), not just one pair count (text_bpe_pairs is round 1's
    // statistics): 5 merge rounds, each = pair-frequency aggregate
    // over the CURRENT segmentation -> argmax rule (count DESC, pair
    // ASC — deterministic ties) -> greedy left-to-right merge applied
    // corpus-wide. Scale shape: training runs on the WORD-FREQUENCY
    // table (the standard BPE compression — pair stats weight by word
    // freq, so the corpus is touched once ever), per round one
    // pair-explode + partial agg + a broadcast 1-row rule + one
    // columnar fold per word (aggregate HOF, codegen) — O(vocab ×
    // word-length) per round regardless of corpus size. The per-round
    // localCheckpoints pin the vocab-sized segmentation and the 1-row
    // rule, each consumed twice (stats + merge / output + merge).
    // Output = the trained merge table, the artifact a tokenizer
    // serves. Oracle: 5 unrolled CTE rounds with the greedy merge
    // replayed by ROW_NUMBER parity (see bpeRoundSql) — hash-exact.
    "text_bpe_train" -> QueryDef(bpeTrainOracle) { (s, d) =>
      bpeTrain(Tables.documents(s, d), rounds = 5)
    },

    // BPE ENCODE — the SERVE side of text_bpe_train (the DSIR-family
    // train/serve pattern): segment every document under the learned
    // 5-rule merge table and report its BPE token count next to its
    // whitespace token count — the number a sequence-packing or
    // token-budget stage actually consumes. Scale shape: the trained
    // segmentation lives on the VOCAB (word -> symbol count, ~|vocab|
    // rows), and encoding the corpus is one word-keyed broadcast join
    // of that tiny table onto the exploded tokens + a per-doc partial
    // agg — the corpus is never re-segmented per document. Words
    // shorter than 2 chars bypass training (they have no pairs) and
    // count as one symbol. Oracle: the train oracle's final
    // segmentation CTE joined back to the docs. Train/serve interlock
    // (encode totals == Σ freq × |syms|) pinned in
    // PipelineIntegrationSpec.
    "text_bpe_encode" -> QueryDef(
      s"""$bpeVocabCte,
         |dt AS (SELECT doc_id, unnest(${tokensSql("text")}) AS word FROM documents)
         |SELECT dt.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(COALESCE(vl.n_syms, 1)) AS BIGINT) AS n_bpe_tokens
         |FROM dt LEFT JOIN vl USING (word)
         |GROUP BY 1 ORDER BY dt.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val vocabLen = bpeSegmentation(docs, rounds = 5)
        .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .join(broadcast(vocabLen), Seq("word"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(coalesce(col("n_syms"), lit(1L))).as("n_bpe_tokens"))
        .orderBy("doc_id")
    },


    // BM25 top-20 for a fixed 3-term query. Shape at scale: one
    // tokenize+tf pass over the corpus (tf per term via a filtered
    // size — no explode, no per-term scan), one single-row stats
    // aggregate broadcast back, one TakeOrderedAndProject. The same
    // tf columns feed an inverted-index variant when the query set is
    // dynamic (text_inverted_index).
    "text_bm25" -> QueryDef({
      val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(t, x -> x = '$t')) AS tf${i + 1}"
      }.mkString(",\n        |    ")
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
         |d AS (
         |  SELECT doc_id, len(t) AS dl,
         |    $tfs
         |  FROM toks),
         |stats AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl,
         |    CAST(SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
         |    CAST(SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
         |    CAST(SUM(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS BIGINT) AS df3
         |  FROM d)
         |SELECT doc_id, $bm25Score AS score
         |FROM d, stats WHERE tf1 + tf2 + tf3 > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    }) { (s, d) =>
      val tfCols = bm25Terms.zipWithIndex.map { case (t, i) =>
        size(filter(col("t"), x => x === t)).as(s"tf${i + 1}")
      }
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(Seq(col("doc_id"), size(col("t")).as("dl")) ++ tfCols: _*)
      val stats = docs.agg(
        count(lit(1)).as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"),
        sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
        sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"),
        sum(when(col("tf3") > 0, 1L).otherwise(0L)).as("df3"))
      docs.crossJoin(broadcast(stats))
        .where(col("tf1") + col("tf2") + col("tf3") > 0)
        .select(col("doc_id"), expr(bm25Score).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // RECIPROCAL-RANK FUSION — the hybrid-retrieval combiner every
    // RAG stack runs: two rankers score the same query, and a doc's
    // fused score is sum(1/(60 + rank_i)) over the lists it appears
    // in — rank-based, so incomparable score scales (BM25 logs vs
    // integer tf-idf) fuse without calibration. ONE corpus pass
    // computes both scores (the checkpointed matched-doc relation
    // feeds both rank windows); ranks come from row_number over the
    // MATCHED docs only (query-term selectivity, not the corpus);
    // the fusion is a full outer join of two 50-row lists. 1e6/(60+r)
    // in truncating integer division keeps the fused score hash-exact.
    "text_rrf_fusion" -> QueryDef({
      val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(t, x -> x = '$t')) AS tf${i + 1}"
      }.mkString(",\n        |    ")
      val idfSum = (1 to 3).map(i =>
        s"tf$i * CAST(round(ln((n + 1.0)/(df$i + 1.0))*1000000) AS BIGINT)")
        .mkString(" + ")
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
         |d AS (
         |  SELECT doc_id, len(t) AS dl,
         |    $tfs
         |  FROM toks),
         |stats AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl,
         |    CAST(SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
         |    CAST(SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
         |    CAST(SUM(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS BIGINT) AS df3
         |  FROM d),
         |sc AS (
         |  SELECT doc_id, $bm25Score AS s1, CAST($idfSum AS BIGINT) AS s2_micro
         |  FROM d, stats WHERE tf1 + tf2 + tf3 > 0),
         |r1 AS (SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY s1 DESC, doc_id) AS BIGINT) AS r
         |       FROM sc QUALIFY r <= 50),
         |r2 AS (SELECT doc_id AS doc2,
         |         CAST(row_number() OVER (ORDER BY s2_micro DESC, doc_id) AS BIGINT) AS r2
         |       FROM sc QUALIFY r2 <= 50)
         |SELECT COALESCE(doc_id, doc2) AS doc_id, r AS r_bm25, r2 AS r_tfidf,
         |  COALESCE(1000000 // (60 + r), 0) + COALESCE(1000000 // (60 + r2), 0)
         |    AS rrf_micro
         |FROM r1 FULL JOIN r2 ON r1.doc_id = r2.doc2
         |ORDER BY rrf_micro DESC, COALESCE(doc_id, doc2) LIMIT 10""".stripMargin
    }) { (s, d) =>
      val tfCols = bm25Terms.zipWithIndex.map { case (t, i) =>
        size(filter(col("t"), x => x === t)).as(s"tf${i + 1}")
      }
      val idfSum = (1 to 3).map(i =>
        s"tf$i * CAST(round(ln((n + 1.0)/(df$i + 1.0))*1000000) AS BIGINT)")
        .mkString(" + ")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(Seq(col("doc_id"), size(col("t")).as("dl")) ++ tfCols: _*)
      val stats = docs.agg(
        count(lit(1)).as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"),
        sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
        sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"),
        sum(when(col("tf3") > 0, 1L).otherwise(0L)).as("df3"))
      val sc = docs.crossJoin(broadcast(stats))
        .where(col("tf1") + col("tf2") + col("tf3") > 0)
        .select(col("doc_id"), expr(bm25Score).as("s1"),
          expr(s"CAST($idfSum AS BIGINT)").as("s2_micro"))
        .pinned
      val w1 = Window.orderBy(col("s1").desc, col("doc_id"))
      val w2 = Window.orderBy(col("s2_micro").desc, col("doc_id"))
      val r1 = sc.select(col("doc_id"),
        row_number().over(w1).cast("long").as("r")).where(col("r") <= 50)
      val r2 = sc.select(col("doc_id").as("doc2"),
        row_number().over(w2).cast("long").as("r2")).where(col("r2") <= 50)
      r1.join(r2, col("doc_id") === col("doc2"), "full")
        .select(coalesce(col("doc_id"), col("doc2")).as("doc_id"),
          col("r").as("r_bm25"), col("r2").as("r_tfidf"),
          (coalesce(expr("1000000 div (60 + r)"), lit(0L))
            + coalesce(expr("1000000 div (60 + r2)"), lit(0L))).as("rrf_micro"))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
    },

    // CROSS-MODAL HYBRID SEARCH — the production RAG retrieval stack
    // end to end: a LEXICAL ranking (BM25 over the documents table)
    // and a SEMANTIC ranking (exact cosine against a query embedding
    // over the ALIGNED embeddings table — vec_id == doc_id) fuse by
    // reciprocal rank. This is what text_rrf_fusion's lexical-only
    // fusion exists to feed: two different MODALITIES, incomparable
    // score scales, one rank-based combiner. Scale shape: the BM25
    // side is one corpus pass + broadcast stats; the semantic side is
    // the brute-force tier (1-row query vector broadcast into a
    // corpus scan — the IVF/PQ machinery takes over when the corpus
    // outgrows it); the fusion is a full outer join of two 50-row
    // lists. Same deterministic 1e6 div (60+r) arithmetic.
    "sim_hybrid_search" -> QueryDef({
      val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(t, x -> x = '$t')) AS tf${i + 1}"
      }.mkString(",\n        |    ")
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
         |d AS (
         |  SELECT doc_id, len(t) AS dl,
         |    $tfs
         |  FROM toks),
         |stats AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl,
         |    CAST(SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
         |    CAST(SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
         |    CAST(SUM(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS BIGINT) AS df3
         |  FROM d),
         |lex AS (
         |  SELECT doc_id, $bm25Score AS s1
         |  FROM d, stats WHERE tf1 + tf2 + tf3 > 0 AND doc_id <> 0),
         |r1 AS (SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY s1 DESC, doc_id) AS BIGINT) AS r
         |       FROM lex QUALIFY r <= 50),
         |sem AS (
         |  SELECT c.vec_id AS doc_id,
         |    ${graft.vec.VecFunctions.cosineSql("q.q_vec", "c.embedding")} AS sim
         |  FROM embeddings c,
         |    (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0) q
         |  WHERE c.vec_id <> 0),
         |r2 AS (SELECT doc_id AS doc2,
         |         CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS r2
         |       FROM sem QUALIFY r2 <= 50)
         |SELECT COALESCE(doc_id, doc2) AS doc_id, r AS r_lex, r2 AS r_sem,
         |  COALESCE(1000000 // (60 + r), 0) + COALESCE(1000000 // (60 + r2), 0)
         |    AS rrf_micro
         |FROM r1 FULL JOIN r2 ON r1.doc_id = r2.doc2
         |ORDER BY rrf_micro DESC, COALESCE(doc_id, doc2) LIMIT 10""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tfCols = bm25Terms.zipWithIndex.map { case (t, i) =>
        size(filter(col("t"), x => x === t)).as(s"tf${i + 1}")
      }
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(Seq(col("doc_id"), size(col("t")).as("dl")) ++ tfCols: _*)
      val stats = docs.agg(
        count(lit(1)).as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"),
        sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
        sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"),
        sum(when(col("tf3") > 0, 1L).otherwise(0L)).as("df3"))
      val lex = docs.crossJoin(broadcast(stats))
        .where(col("tf1") + col("tf2") + col("tf3") > 0 && col("doc_id") =!= 0)
        .select(col("doc_id"), expr(bm25Score).as("s1"))
      // rank fusion is PER-QUERY work: the windows partition by the
      // query key (one query here, so the key degenerates to a
      // constant — derived from a data column so it cannot fold away
      // and the partition spec stays real; with a query batch this is
      // the column the fusion already needs). The rank-limit pushdown
      // then cuts every input partition to its top-50 map-side, so no
      // single-partition sort of the scored corpus exists at any k.
      val w1 = Window.partitionBy(col("doc_id") % 1)
        .orderBy(col("s1").desc, col("doc_id"))
      val r1 = lex.select(col("doc_id"),
        row_number().over(w1).cast("long").as("r")).where(col("r") <= 50)
      val emb = Tables.embeddings(s, d)
      val qv = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("q_vec"))
      val sem = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc2"),
          graft.vec.VecFunctions.cosine(col("q_vec"), col("embedding")).as("sim"))
      val w2 = Window.partitionBy(col("doc2") % 1)
        .orderBy(col("sim").desc, col("doc2"))
      val r2 = sem.select(col("doc2"),
        row_number().over(w2).cast("long").as("r2")).where(col("r2") <= 50)
      r1.join(r2, col("doc_id") === col("doc2"), "full")
        .select(coalesce(col("doc_id"), col("doc2")).as("doc_id"),
          col("r").as("r_lex"), col("r2").as("r_sem"),
          (coalesce(expr("1000000 div (60 + r)"), lit(0L))
            + coalesce(expr("1000000 div (60 + r2)"), lit(0L))).as("rrf_micro"))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
    },

    // unigram token entropy per document, in integer MICRO-NATS:
    // H = ln(n) - (sum c_i*ln(c_i))/n with each ln pre-rounded to a
    // 1e-6 integer grid. Makes the cross-partition sum exact (ints),
    // and the grid is safe: min distance of ln(c)*1e6 from a rounding
    // boundary over c in [1, 1e5] is 2.8e-6, vs ~4e-10 of cross-libm
    // ulp noise (pinned in R5OpsSpec). One explode + two keyed aggs.
    "text_entropy" -> QueryDef(
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(${tokensSql("text")}) AS tok FROM documents),
         |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tk GROUP BY 1, 2),
         |e AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         |        CAST(SUM(c * CAST(round(ln(c)*1000000) AS BIGINT)) AS BIGINT) AS s
         |      FROM c GROUP BY 1)
         |SELECT doc_id, CAST(round(ln(n)*1000000) AS BIGINT) - s // n AS h_mnat
         |FROM e ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n"),
          sum(expr("c * CAST(round(ln(c)*1000000) AS BIGINT)")).as("s"))
        .select(col("doc_id"),
          expr("CAST(round(ln(n)*1000000) AS BIGINT) - s div n").as("h_mnat"))
        .orderBy("doc_id")
    },

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score every raw
    // document by how target-like its hashed-n-gram profile is —
    // weight = Σ_b n_doc(b) · ln(p_target(b) / p_raw(b)) under
    // add-1-smoothed bag-of-hashed-unigrams models (256 md5 buckets,
    // the text_hashed_features vocabulary-free feature space; target
    // = the lang='en' slice, raw = the whole corpus). The per-bucket
    // log-ratio is ONE ln over an exactly-representable integer ratio
    // (counts < 2^26 so the cross-products stay < 2^53), pre-rounded
    // to the 1e-6 grid; per-doc weights are then pure BIGINT dot
    // products — partition-order free, hash-exact. Scale shape: one
    // tokenize+hash pass, one (doc,bucket) partial agg, one 256-row
    // bucket-stats agg with its totals attached as a broadcast
    // one-row frame, and a broadcast join back onto the per-doc
    // counts: scan-bound at any corpus size, nothing quadratic, and
    // the model itself is 256 integers — the whole "train the
    // importance sampler" step ships as a closure.
    "text_dsir" -> QueryDef(
      s"""WITH w AS (
         |  SELECT doc_id, lang,
         |    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 256 AS bucket
         |  FROM (SELECT doc_id, lang, unnest(${tokensSql("text")}) AS tok
         |        FROM documents)),
         |dc AS (SELECT doc_id, lang, bucket, COUNT(*) AS n FROM w GROUP BY 1, 2, 3),
         |bs AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS rc,
         |         CAST(SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT) AS tc
         |       FROM dc GROUP BY 1),
         |tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS rtot,
         |               CAST(SUM(tc) AS BIGINT) AS ttot FROM bs),
         |lr AS (SELECT bucket,
         |         CAST(round(ln(
         |           (CAST(tc + 1 AS DOUBLE) * CAST(rtot + 256 AS DOUBLE)) /
         |           (CAST(rc + 1 AS DOUBLE) * CAST(ttot + 256 AS DOUBLE))
         |         ) * 1000000) AS BIGINT) AS lr_micro
         |       FROM bs, tot)
         |SELECT dc.doc_id,
         |  CAST(SUM(dc.n) AS BIGINT) AS n_tokens,
         |  CAST(SUM(dc.n * lr.lr_micro) AS BIGINT) AS w_micro
         |FROM dc JOIN lr USING (bucket)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val (dc, lr) = dsirParts(s, d)
      dc.join(broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(sum("n").as("n_tokens"),
          sum(col("n") * col("lr_micro")).as("w_micro"))
        .orderBy("doc_id")
    },

    // the DSIR ACTION step — the deterministic selection text_dsir's
    // weights exist for: rank every document by target-likeness
    // (w_micro DESC, doc_id ties) and keep the top quarter. True DSIR
    // resamples ∝ exp(weight) with Gumbel noise; the RNG-free variant
    // (top-k by weight) is the repo's reproducibility discipline —
    // rerun it on the same corpus anywhere and the selected set is
    // byte-identical. Scale shape (r17 — now CODE, not prose): the
    // rank runs over the (doc, weight) AGGREGATE — never the text —
    // as a TWO-PHASE exact global rank (value-bucketed offsets +
    // bucket-partitioned in-bucket rank, the feat_quantile_bin
    // idiom), so the exact top-quarter selection needs no global
    // sort at any corpus size. Model + scoring arithmetic identical
    // to text_dsir (CorpusQueries.dsirModel).
    "sample_dsir_select" -> QueryDef(
      s"""WITH w AS (
         |  SELECT doc_id, lang,
         |    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 256 AS bucket
         |  FROM (SELECT doc_id, lang, unnest(${tokensSql("text")}) AS tok
         |        FROM documents)),
         |dc AS (SELECT doc_id, lang, bucket, COUNT(*) AS n FROM w GROUP BY 1, 2, 3),
         |bs AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS rc,
         |         CAST(SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT) AS tc
         |       FROM dc GROUP BY 1),
         |tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS rtot,
         |               CAST(SUM(tc) AS BIGINT) AS ttot FROM bs),
         |lr AS (SELECT bucket,
         |         CAST(round(ln(
         |           (CAST(tc + 1 AS DOUBLE) * CAST(rtot + 256 AS DOUBLE)) /
         |           (CAST(rc + 1 AS DOUBLE) * CAST(ttot + 256 AS DOUBLE))
         |         ) * 1000000) AS BIGINT) AS lr_micro
         |       FROM bs, tot),
         |dw AS (SELECT dc.doc_id, CAST(SUM(dc.n * lr.lr_micro) AS BIGINT) AS w_micro
         |       FROM dc JOIN lr USING (bucket) GROUP BY 1),
         |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM dw),
         |r AS (SELECT doc_id, w_micro,
         |        ROW_NUMBER() OVER (ORDER BY w_micro DESC, doc_id) AS sel_rank
         |      FROM dw)
         |SELECT doc_id, w_micro, sel_rank
         |FROM r, cnt WHERE sel_rank <= n_docs // 4
         |ORDER BY sel_rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val (dc, lr) = dsirParts(s, d)
      // dw feeds BOTH the rank window and the one-row cnt broadcast —
      // pinned so the scoring join runs once (same bound as dc: one
      // (doc_id, w_micro) row per doc; swept post-query by the
      // harness)
      val dw = dc.join(broadcast(lr), "bucket")
        .groupBy("doc_id").agg(sum(col("n") * col("lr_micro")).as("w_micro"))
        .pinned
      val cnt = dw.agg(count(lit(1)).as("n_docs"))
      // two-phase exact global rank (r17, found by the full-surface
      // audit sweep — the old global row_number was the r14 seed
      // shape: a single-partition sort of a doc-count relation, with
      // the scale path only in prose). feat_quantile_bin's idiom on
      // the VALUE axis: bucket so ascending bkt == descending
      // w_micro (floor keeps the map monotone across negatives), the
      // per-bucket counts collapse to a tiny value-range axis whose
      // prefix sum is each bucket's rank offset, and the in-bucket
      // rank window is bucket-partitioned. sel_rank values identical.
      val dwb = dw.withColumn("bkt",
        expr("CAST(floor((-w_micro) / 1048576.0) AS BIGINT)"))
      val off = dwb.groupBy("bkt").agg(count(lit(1)).as("bc"))
      // the value axis is NOT provably bounded (occupied buckets grow
      // with doc length × log-ratio range), so its prefix is the same
      // two-LEVEL fold as sample_weighted's (AxisOffsets, r18): the
      // one unpartitioned window runs over the super axis only
      val offs = AxisOffsets.exclusivePrefix(off, "bkt", "bc")
      val wLoc = Window.partitionBy("bkt")
        .orderBy(col("w_micro").desc, col("doc_id"))
      dwb.join(broadcast(offs), "bkt")
        .withColumn("sel_rank",
          row_number().over(wLoc).cast("long") + col("off"))
        .crossJoin(broadcast(cnt))
        .where(col("sel_rank") <= expr("n_docs div 4"))
        .select("doc_id", "w_micro", "sel_rank")
        .orderBy("sel_rank")
    },

    // sequence packing, pretraining style: concatenate each source's
    // docs in doc_id order and cut the stream into fixed 4096-char
    // windows; a doc's bin = the window its first char lands in.
    // One window-sum per source partition (sources are the natural
    // pack unit and hash-spread at scale — no global sort); all
    // integer arithmetic.
    "pack_sequences" -> QueryDef(
      """WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |    COALESCE(CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
        |  FROM documents)
        |SELECT doc_id, source, n_chars,
        |  cum_before // 4096 AS bin, cum_before % 4096 AS offset_in_bin
        |FROM t ORDER BY source, doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          coalesce(sum("n_chars").over(w), lit(0L)).as("cum_before"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("cum_before div 4096").as("bin"),
          expr("cum_before % 4096").as("offset_in_bin"))
        .orderBy("source", "doc_id")
    },

    // URL canonicalization dedup — the crawl-pipeline step before any
    // content dedup: lowercase, strip fragment, strip tracking params
    // (utm_*), repair the dangling '&' that stripping can leave, and
    // drop the pre-query trailing slash; variants then collapse by
    // exact grouping. Planted: 250 URLs in 10 surface variants per
    // canonical target (case, trailing slash, utm param, fragment).
    // Pure per-row regex chain (codegen'd) + one groupBy — scales with
    // the scan. NOTE: the single-occurrence patterns keep Spark's
    // replace-all and DuckDB's replace-first semantics aligned.
    "dedup_url_canonical" -> QueryDef(
      """WITH aug AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.SHOP' ELSE 'https://www.shop' END
        |    || CAST(doc_id % 5 AS VARCHAR) || '.Example.com/item/' || CAST(doc_id % 25 AS VARCHAR)
        |    || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
        |    || '?utm_source=s' || CAST(doc_id % 7 AS VARCHAR)
        |    || '&id=' || CAST(doc_id % 25 AS VARCHAR)
        |    || CASE WHEN doc_id % 6 = 0 THEN '#top' ELSE '' END AS raw
        |  FROM documents WHERE doc_id % 2 = 0),
        |canon AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(
        |      CASE WHEN NOT contains(s3, '?') THEN regexp_replace(s3, '&', '?') ELSE s3 END,
        |      '/\?', '?') AS curl
        |  FROM (
        |    SELECT doc_id, raw,
        |      regexp_replace(
        |        regexp_replace(lower(raw), '#.*$', ''),
        |        '[?&]utm_[a-z]+=[^&#]*', '') AS s3
        |    FROM aug))
        |SELECT curl, COUNT(*) AS n_variants, COUNT(DISTINCT raw) AS n_raw
        |FROM canon GROUP BY curl HAVING COUNT(*) >= 2 ORDER BY curl""".stripMargin) { (s, d) =>
      val raw = concat(
        when(pmod(col("doc_id"), lit(3)) === 0, lit("HTTPS://WWW.SHOP"))
          .otherwise(lit("https://www.shop")),
        pmod(col("doc_id"), lit(5)).cast("string"), lit(".Example.com/item/"),
        pmod(col("doc_id"), lit(25)).cast("string"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=s"), pmod(col("doc_id"), lit(7)).cast("string"),
        lit("&id="), pmod(col("doc_id"), lit(25)).cast("string"),
        when(pmod(col("doc_id"), lit(6)) === 0, lit("#top")).otherwise(lit("")))
      Tables.documents(s, d)
        .where(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"), raw.as("raw"))
        .withColumn("s3", regexp_replace(
          regexp_replace(lower(col("raw")), "#.*$", ""),
          "[?&]utm_[a-z]+=[^&#]*", ""))
        .withColumn("curl", regexp_replace(
          when(!col("s3").contains("?"), regexp_replace(col("s3"), "&", "?"))
            .otherwise(col("s3")),
          "/\\?", "?"))
        .groupBy("curl")
        .agg(count(lit(1)).as("n_variants"), countDistinct(col("raw")).as("n_raw"))
        .where(col("n_variants") >= 2)
        .orderBy("curl")
    },

    // temperature-scaled domain mixing (alpha = 0.5): sample languages
    // proportional to count^alpha instead of count, the standard
    // rebalancing for multilingual pretraining. Integer per-mille
    // weights floor(sqrt(n)*1000) — sqrt is IEEE-correctly-rounded on
    // both engines, so the floor is deterministic — then an integer
    // largest-floor allocation of 200 slots and a deterministic
    // Lehmer-hash draw of each language's quota. No rand(), no
    // collect; the per-domain row_number is the only window.
    "sample_temperature" -> QueryDef(
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n, CAST(floor(sqrt(n)*1000) AS BIGINT) AS wgt FROM c),
        |tot AS (SELECT CAST(SUM(wgt) AS BIGINT) AS tw FROM w),
        |alloc AS (SELECT lang, LEAST(n, (200 * wgt) // tw) AS take FROM w, tot),
        |r AS (SELECT doc_id, lang,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY ((doc_id % 1048573) * 48271) % 2147483647, doc_id) AS rn
        |      FROM documents)
        |SELECT r.doc_id, r.lang FROM r JOIN alloc USING (lang)
        |WHERE rn <= take ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val w = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .select(col("lang"), col("n"),
          expr("CAST(floor(sqrt(n)*1000) AS BIGINT)").as("wgt"))
      val tot = w.agg(sum("wgt").as("tw"))
      val alloc = w.crossJoin(broadcast(tot))
        .select(col("lang"), least(col("n"), expr("(200 * wgt) div tw")).as("take"))
      val rn = Window.partitionBy("lang")
        .orderBy(expr("((doc_id % 1048573) * 48271) % 2147483647"), col("doc_id"))
      docs.select(col("doc_id"), col("lang"),
          row_number().over(rn).as("rn"))
        .join(broadcast(alloc), "lang")
        .where(col("rn") <= col("take"))
        .select(col("doc_id"), col("lang"))
        .orderBy("lang", "doc_id")
    },

    // fractional-EPOCH mixing schedule: each source gets an epoch
    // factor (here 1.0-3.5, derived from its id; quality scores in
    // practice), and every doc materializes floor(e) copies plus one
    // more for a deterministic hash-draw fraction of docs — how a
    // pretraining run up-samples curated sources without an RNG.
    // Pure per-row integer arithmetic + a generator explode: no
    // shuffle anywhere (the output order is the only sort), the same
    // schedule at any parallelism, and the doc's copy count never
    // changes as the corpus grows. All integer => hash-exact.
    "sample_mix_epochs" -> QueryDef(
      """WITH f AS (SELECT doc_id, source,
        |    1000 + (CAST(substr(source, 4) AS BIGINT) * 137) % 2500 AS epm,
        |    ((doc_id % 1048573) * 48271) % 2147483647 % 1000 AS draw
        |  FROM documents)
        |SELECT doc_id, source, CAST(e AS BIGINT) AS epoch
        |FROM f, UNNEST(range(1, CAST(epm // 1000
        |    + CASE WHEN draw < epm % 1000 THEN 1 ELSE 0 END AS BIGINT) + 1)) AS t(e)
        |ORDER BY doc_id, epoch""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          expr("1000 + (CAST(substring(source, 4) AS BIGINT) * 137) % 2500").as("epm"),
          expr("((doc_id % 1048573) * 48271) % 2147483647 % 1000").as("draw"))
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1L),
            expr("epm div 1000 + IF(draw < epm % 1000, 1, 0)"))).as("epoch"))
        .orderBy("doc_id", "epoch")
    }
  )
}
