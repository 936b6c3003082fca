package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY §2.C): media as opaque binary
  * payloads with typed metadata, processed partition-wise in batches.
  *
  * Convention: `media STRUCT<payload BINARY, meta MAP<STRING,STRING>>`
  * — the payload column stays opaque to Catalyst (scans prune it
  * whenever untouched); metadata is queryable/filterable without
  * touching bytes.
  *
  * DECODING IS STUBBED: no image/audio codecs exist in this
  * environment, so [[StubDecoder]] produces a deterministic
  * byte-histogram "feature" — the Spark-side plumbing (schema,
  * Dataset[T] encoders, partition-wise batch shape, pluggable decoder
  * seam) is the real deliverable and is exactly what a libjpeg/ffmpeg
  * decoder would plug into.
  */
object Multimodal {

  val mediaType: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  final case class MediaRecord(
      doc_id: Long, kind: String, payload: Array[Byte], meta: Map[String, String])

  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Int, features: Array[Float])

  /** The decode seam: payload + meta -> feature vector. Implementations
    * must be deterministic and thread-safe (one instance is shared per
    * executor after broadcast-serialization).
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], meta: Map[String, String]): Array[Float]
  }

  /** STUB decoder (see object docs): 16-bin byte histogram, L1
    * normalized. Deterministic stand-in for codec output.
    */
  object StubDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte], meta: Map[String, String]): Array[Float] = {
      val bins = new Array[Float](16)
      var i = 0
      while (i < payload.length) { bins((payload(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(payload.length, 1).toFloat
      var j = 0
      while (j < 16) { bins(j) /= n; j += 1 }
      bins
    }
  }

  /** Attach a synthetic payload derived from the text digest (stands in
    * for real media bytes; 16 deterministic bytes per doc).
    */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.withColumn("media", struct(
      unhex(md5(col("text").cast("binary"))).as("payload"),
      map(
        lit("mime"), lit("image/stub"),
        lit("width"), lit("4"),
        lit("height"), lit("4")).as("meta")))

  /** Partition-wise batched feature extraction. Batching (the shape a
    * vectorized codec or model runtime wants) is explicit:
    * `grouped(batchSize)` hands the decoder contiguous chunks without
    * materializing a partition in memory.
    */
  def extractFeatures(
      media: Dataset[MediaRecord],
      decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val f = decoder.decode(r.payload, r.meta)
          MediaFeatures(r.doc_id, r.kind, r.payload.length, f)
        }
      }
    }
  }

  /** "Resize" for decoded features: average-pool the feature vector by
    * `factor` (the post-decode analog of image downscaling — a real
    * codec pipeline resizes pixels, this pipeline pools the feature
    * map; same shape contract either way). Truncating semantics: the
    * output has floor(n/factor) full windows; a trailing remainder (and
    * any vector shorter than `factor`) is dropped, so every emitted
    * value is the mean of exactly `factor` inputs. Columnar HOF —
    * stays in codegen, no UDF.
    */
  def poolFeatures(df: DataFrame, factor: Int): DataFrame = {
    val nChunks = floor(size(col("features")) / factor).cast("int")
    df.withColumn("features",
      when(nChunks <= 0, array().cast("array<float>"))
        .otherwise(transform(
          sequence(lit(0), nChunks - 1),
          i => (aggregate(
            slice(col("features"), i * factor + 1, lit(factor)),
            lit(0.0f), (acc, x) => acc + x) / factor).cast("float"))))
  }

  /** Frame sampling for sequential media: split the payload into
    * fixed-size frames and emit one row per sampled frame (every
    * `stride`-th). Pure columnar (no decoder needed for the split).
    */
  def frameSample(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val payload = col("media.payload")
    val nFrames = floor(length(payload) / lit(frameBytes)).cast("int")
    val idxs = when(nFrames > 0,
      filter(sequence(lit(0), nFrames - 1), i => i % stride === 0))
      .otherwise(array().cast("array<int>"))
    df.withColumn("frame_idx", explode(idxs))
      .withColumn("frame", payload.substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
  }
}
