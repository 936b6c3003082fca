package graft.mm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media struct: 16-byte digest payload + queryable metadata") {
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    val m = Multimodal.withFakeMedia(docs)
    val rows = m.select(
      col("doc_id"),
      length(col("media.payload")).as("n"),
      col("media.meta")("mime")).orderBy("doc_id").collect()
    assert(rows.forall(_.getInt(1) == 16))
    assert(rows.forall(_.getString(2) == "image/stub"))
  }

  test("stub decode: partition-batched, deterministic, L1-normalized features") {
    val docs = Seq((1L, "hello"), (2L, "world"), (3L, "hello")).toDF("doc_id", "text")
    val media = Multimodal.withFakeMedia(docs)
      .select(col("doc_id"), lit("image").as("kind"),
        col("media.payload").as("payload"), col("media.meta").as("meta"))
      .as[Multimodal.MediaRecord]
    val feats = Multimodal.extractFeatures(media, Multimodal.StubDecoder, batchSize = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 16)
    assert(feats(1L).features.length == 16)
    assert(math.abs(feats(1L).features.sum - 1.0f) < 1e-5)
    // same text -> same payload -> identical features
    assert(feats(1L).features.toSeq == feats(3L).features.toSeq)
    assert(feats(1L).features.toSeq != feats(2L).features.toSeq)
  }

  test("frame sampling: 4-byte frames at stride 2 from a 16-byte payload") {
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(
      Multimodal.withFakeMedia(docs), frameBytes = 4, stride = 2)
      .select(col("frame_idx"), length(col("frame")).as("len"))
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(0)).toSeq == Seq(0, 2))
    assert(frames.forall(_.getInt(1) == 4))
  }

  test("feature pooling halves the vector and preserves the mean") {
    val df = Seq((1L, Array(1f, 3f, 5f, 7f))).toDF("doc_id", "features")
    val pooled = Multimodal.poolFeatures(df, factor = 2)
      .select(col("features")).head().getSeq[Float](0)
    assert(pooled == Seq(2f, 6f))
  }

  test("feature pooling drops the remainder and handles short/empty vectors") {
    val df = Seq(
      (1L, Array(1f, 3f, 5f)),  // remainder 5f dropped
      (2L, Array(3f)),          // shorter than factor -> empty
      (3L, Array.empty[Float])) // empty -> empty
      .toDF("doc_id", "features")
    val pooled = Multimodal.poolFeatures(df, factor = 2)
      .orderBy("doc_id").select(col("features"))
      .collect().map(_.getSeq[Float](0))
    assert(pooled(0) == Seq(2f))
    assert(pooled(1).isEmpty)
    assert(pooled(2).isEmpty)
  }
}
