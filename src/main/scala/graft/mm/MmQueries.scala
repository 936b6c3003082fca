package graft.mm

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Verify-gate entries for the multimodal surface. The payload bytes
  * are a digest of the text (deterministic), so byte counts are
  * oracle-checkable; the stub-decoded features are engine-side only
  * (rows-only check + unit-pinned values).
  */
object MmQueries {

  val defs: Map[String, QueryDef] = Map(

    // media struct construction + metadata projection + payload length:
    // payload stays opaque; the oracle checks the byte count via the
    // same md5 derivation
    "mm_media_schema" -> QueryDef(
      """SELECT doc_id,
        |  octet_length(unhex(md5(text))) AS n_bytes,
        |  'image/stub' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Multimodal.withFakeMedia(Tables.documents(s, d))
        .select(
          col("doc_id"),
          length(col("media.payload")).as("n_bytes"),
          col("media.meta")("mime").as("mime"))
        .orderBy("doc_id")
    },

    // EXACT media dedup on the opaque binary payload — the multimodal
    // twin of dedup_exact: group by payload digest, report duplicate
    // groups (n copies + representative id). The payload never leaves
    // the executor: only the 16-byte digest shuffles, which is the
    // whole point at 100 TB of images — a map-side digest + one
    // digest-keyed partial aggregate, identical for real JPEG bytes.
    // (Digest here = the payload's hex image; stub payloads are
    // md5(text) bytes, so the oracle derives the identical digest
    // from the raw docs — DuckDB's md5() cannot hash BLOBs. The
    // corpus has no NATURAL byte-dups below sf0.1, so re-uploaded
    // copies of docs < 15 are planted at +50000 — the verifier then
    // checks 15 real duplicate groups at every scale instead of
    // vacuously matching an empty set.)
    "mm_dedup_exact" -> QueryDef(
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 50000, text FROM documents WHERE doc_id < 15)
        |SELECT md5(text) AS payload_digest,
        |  CAST(COUNT(*) AS BIGINT) AS n_copies,
        |  MIN(doc_id) AS rep_doc
        |FROM docs
        |GROUP BY 1 HAVING COUNT(*) >= 2
        |ORDER BY payload_digest""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val aug = docs.unionByName(
        docs.where(col("doc_id") < 15)
          .withColumn("doc_id", col("doc_id") + 50000L))
      Multimodal.withFakeMedia(aug)
        .select(col("doc_id"),
          lower(hex(col("media.payload"))).as("payload_digest"))
        .groupBy("payload_digest")
        .agg(count(lit(1)).as("n_copies"), min("doc_id").as("rep_doc"))
        .where(col("n_copies") >= 2)
        .orderBy("payload_digest")
    },

    // partition-wise batched stub decode -> per-doc feature vector
    "mm_decode_features" -> QueryDef.rowsOnly { (s, d) =>
      import s.implicits._
      val media = Multimodal.withFakeMedia(Tables.documents(s, d))
        .select(
          col("doc_id"),
          lit("image").as("kind"),
          col("media.payload").as("payload"),
          col("media.meta").as("meta"))
        .as[Multimodal.MediaRecord]
      // features is ARRAY<FLOAT>, which the driver's pandas compare
      // can't sort — project harness-safe scalars: length + a rounded
      // checksum of the vector (deterministic: left-to-right fold)
      Multimodal.extractFeatures(media, Multimodal.StubDecoder, batchSize = 64)
        .toDF()
        .select(col("doc_id"), col("n_bytes"),
          size(col("features")).cast("long").as("n_feat"),
          round(aggregate(transform(col("features"), _.cast("double")),
            lit(0.0), (acc, x) => acc + x), 6).as("feat_sum"))
        .orderBy("doc_id")
    },

    // decode -> pool ("resize") chain: 16-bin features pooled to 8
    "mm_resize_pool" -> QueryDef.rowsOnly { (s, d) =>
      import s.implicits._
      val media = Multimodal.withFakeMedia(Tables.documents(s, d))
        .select(
          col("doc_id"),
          lit("image").as("kind"),
          col("media.payload").as("payload"),
          col("media.meta").as("meta"))
        .as[Multimodal.MediaRecord]
      val feats = Multimodal
        .extractFeatures(media, Multimodal.StubDecoder, batchSize = 64)
        .toDF()
      // same harness-safety projection as mm_decode_features: the
      // pooled vector goes out as length + rounded checksum scalars
      Multimodal.poolFeatures(feats, factor = 2)
        .select(col("doc_id"),
          size(col("features")).cast("long").as("n_feat"),
          round(aggregate(transform(col("features"), _.cast("double")),
            lit(0.0), (acc, x) => acc + x), 6).as("feat_sum"))
        .orderBy("doc_id")
    },

    // frame sampling: one row per 4-byte frame, stride 2
    "mm_frame_sample" -> QueryDef(
      """SELECT doc_id, f AS frame_idx FROM documents,
        |  (SELECT unnest([0, 2]) AS f)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      Multimodal.frameSample(
        Multimodal.withFakeMedia(Tables.documents(s, d)), frameBytes = 4, stride = 2)
        .select(col("doc_id"), col("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    },

    // BYTE-BUDGET BATCH PACKING — assemble media examples into
    // training batches under a per-batch byte budget, sharded so the
    // packing parallelizes: the media twin of pack_sequences (which
    // budgets tokens). Assignment is the deterministic LINEAR pack —
    // batch = (bytes before me, in doc order within my shard) div
    // budget — one running-sum window per shard, no sequential
    // bin-packing state, so the same layout computes on any number of
    // executors. Media sizes are stub-derived (1000..9999 bytes from
    // an md5 draw — the decode seam is stubbed, the plumbing is real)
    // and the oracle re-derives them identically; every batch except
    // a shard's last lands within budget of full (pinned in the
    // suite).
    "mm_pack_batches" -> QueryDef(
      """WITH m AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    1000 + CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 9000
        |      AS bytes
        |  FROM documents),
        |c AS (SELECT shard, doc_id, bytes,
        |        SUM(bytes) OVER (PARTITION BY shard ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) - bytes AS before
        |      FROM m)
        |SELECT shard, CAST(before // 65536 AS BIGINT) AS batch_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(bytes) AS BIGINT) AS total_bytes,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val m = Tables.documents(s, d).select(col("doc_id"),
        (col("doc_id") % 8).as("shard"),
        expr("""1000 + CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)
                % 9000""").as("bytes"))
      m.withColumn("before", sum("bytes").over(w) - col("bytes"))
        .groupBy(col("shard"), expr("CAST(before div 65536 AS BIGINT)").as("batch_id"))
        .agg(count(lit(1)).as("n_items"), sum("bytes").as("total_bytes"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard", "batch_id")
    }
  )
}
