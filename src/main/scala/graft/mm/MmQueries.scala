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
    }
  )
}
