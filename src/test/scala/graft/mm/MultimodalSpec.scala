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

  test("decodePpm parses the full netpbm header grammar, not just the fixture") {
    // arbitrary dims, comment lines, mixed whitespace — a real P6 file
    val header = "P6 # magic\n# a comment line\n 3\t2 # dims\n255\n"
    val raster = Array.tabulate[Byte](18)(i => (i * 7).toByte)
    val img = Multimodal.decodePpm(header.getBytes("US-ASCII") ++ raster)
    assert((img.width, img.height) == ((3, 2)))
    assert(img.pixels.toSeq == raster.toSeq)
  }

  test("decodePpm rejects malformed input loudly") {
    val good = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Multimodal.decodePpm(good).pixels.toSeq == Seq[Byte](1, 2, 3))
    intercept[IllegalArgumentException] { // wrong magic
      Multimodal.decodePpm("P5\n1 1\n255\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decodePpm("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1))
    }
    intercept[IllegalArgumentException] { // 16-bit maxval unsupported
      Multimodal.decodePpm("P6\n1 1\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](6))
    }
    // adversarial headers (r13 ADVICE): dimensions crafted so the Int
    // product w*h*3 would wrap and match a short payload's length must
    // fail via require, not pass the length check and die later with
    // ArrayIndexOutOfBounds in the pixel loop. 37838×37838×3 =
    // 4294958532 ≡ 4 × 2^0... ≡ -8764 wraps ≈ small positive under Int.
    intercept[IllegalArgumentException] { // Long raster math: no wrap
      Multimodal.decodePpm("P6\n37838 37838\n255\n".getBytes("US-ASCII")
        ++ new Array[Byte](12))
    }
    intercept[IllegalArgumentException] { // digit-run overflow capped
      Multimodal.decodePpm("P6\n99999999999 1\n255\n".getBytes("US-ASCII")
        ++ new Array[Byte](3))
    }
    intercept[IllegalArgumentException] { // zero dimension rejected
      Multimodal.decodePpm("P6\n0 5\n255\n".getBytes("US-ASCII"))
    }
  }

  test("withPpmMedia payloads are standards-valid P6 files the real parser opens") {
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    val payloads = Multimodal.withPpmMedia(docs)
      .select(col("doc_id"), col("media.payload")).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(payloads.values.forall(_.length == 203))
    val img = Multimodal.decodePpm(payloads(1L))
    assert((img.width, img.height) == ((8, 8)))
    // pixels are the md5 chain: first 16 raster bytes == md5("hello:0")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("hello:0".getBytes("UTF-8"))
    assert(img.pixels.take(16).toSeq == md.toSeq)
  }

  test("dHash: brightness-invariant, jitter stays within Hamming 2, real pairs stay far") {
    // unit law of the perceptual hash: a uniform +7 on every raster
    // byte leaves every gradient bit unchanged away from clamps
    // (BT.601 trunc-div shifts luma exactly +7), the full jitter
    // (+7 brightness + 4 noise bytes) moves the hash by at most a
    // couple of bits, and two unrelated images disagree on ~half the
    // 56 bits — the margins the <=8 verify threshold rides on.
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    def bandsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = df
      .select(col("doc_id"), col("media.payload")).collect()
      .map(r => r.getLong(0) ->
        Multimodal.PpmDHashDecoder.decode(r.getAs[Array[Byte]](1), Map.empty)
          .map(_.toLong).toSeq).toMap
    val base = bandsOf(Multimodal.withPpmMedia(docs))
    val jit = bandsOf(Multimodal.withJitteredPpmMedia(docs))
    def ham(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(base(1L).forall(v => v >= 0 && v < (1L << 14)), s"band range: ${base(1L)}")
    assert(ham(base(1L), jit(1L)) <= 2, s"jitter moved doc 1 by ${ham(base(1L), jit(1L))}")
    assert(ham(base(2L), jit(2L)) <= 2, s"jitter moved doc 2 by ${ham(base(2L), jit(2L))}")
    assert(ham(base(1L), base(2L)) > 8, s"unrelated images too close: ${ham(base(1L), base(2L))}")
  }

  test("mm_dedup_phash recalls every planted jittered image against its original") {
    // end-to-end recall contract at sf0.001: all 40 planted jittered
    // copies are dropped, each against a real (pre-offset) keeper, at
    // the measured 0..2 Hamming — and the natural band collisions
    // (79 candidate pairs at sf0.01) never survive the verify, so no
    // genuine distinct image is dropped.
    val rows = MmQueries.defs("mm_dedup_phash").build(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val planted = rows.filter(_._1 >= graft.mm.Multimodal.PlantedIdOffset)
    assert(planted.length == 40, s"expected 40 planted drops, got ${planted.length}")
    planted.foreach { case (dropped, keeper, minHam) =>
      assert(keeper < graft.mm.Multimodal.PlantedIdOffset, s"planted $dropped kept by another planted copy $keeper")
      assert(minHam <= 2L, s"planted $dropped at Hamming $minHam (measured max 2)")
    }
    rows.filter(_._1 < graft.mm.Multimodal.PlantedIdOffset).foreach { case (dropped, _, minHam) =>
      assert(minHam == 0L,
        s"real image $dropped dropped at Hamming $minHam — only byte-dup texts may die")
    }
  }

  test("r18 phash tiers: shuffled twin bit-equal + zero broadcast hints; wide band keeps planted recall") {
    // tier interlock (the triangle-family discipline applied to the
    // phash verify sides the provenance seam surfaced): the
    // ShuffledStatic twin must return byte-identical rows to the
    // Broadcast bench tier, and its OPTIMIZED plan must carry zero
    // broadcast hints — every side meets its partner as an equi-join
    // free to shuffle.
    val bench = MmQueries.defs("mm_dedup_phash").build(spark, sf0001).collect().toSeq
    val twin = MmQueries.defs("mm_dedup_phash_shuffled").build(spark, sf0001).collect().toSeq
    assert(bench == twin, s"tier results differ: ${bench.size} vs ${twin.size} rows")
    val twinPlan = MmQueries.defs("mm_dedup_phash_shuffled").build(spark, sf0001)
      .queryExecution.optimizedPlan
    val hinted = twinPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if Seq(j.hint.leftHint, j.hint.rightHint).flatten
            .exists(_.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) => j
    }
    assert(hinted.isEmpty, s"shuffled twin carries ${hinted.size} broadcast hint(s)")
    // wide band (3 × 19 bits): planted pairs sit at Hamming 0..2, and
    // any pair with Hamming < nBands has a clean band by pigeonhole —
    // so the 24×-larger bucket space must lose NO planted drop
    val wide = MmQueries.defs("mm_dedup_phash_wide").build(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val plantedWide = wide.filter(_._1 >= graft.mm.Multimodal.PlantedIdOffset)
    assert(plantedWide.length == 40,
      s"wide band lost planted recall: ${plantedWide.length}/40")
    plantedWide.foreach { case (dropped, keeper, minHam) =>
      assert(keeper < graft.mm.Multimodal.PlantedIdOffset && minHam <= 2L,
        s"wide: planted $dropped keeper=$keeper ham=$minHam")
    }
  }

  test("extractFeaturesSafe quarantines corrupt payloads without killing the job") {
    val good = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30)
    val records = Seq(
      Multimodal.MediaRecord(1L, "image", good, Map.empty),
      Multimodal.MediaRecord(2L, "image", good.dropRight(1), Map.empty), // truncated
      Multimodal.MediaRecord(3L, "image", "garbage".getBytes, Map.empty))
      .toDS()
    val out = Multimodal
      .extractFeaturesSafe(records, Multimodal.PpmFeatureDecoder, batchSize = 2)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).ok && out(1L).features(2) == 10f)
    assert(!out(2L).ok && out(2L).error.contains("raster"))
    assert(!out(3L).ok && out(3L).error.contains("not a P6"))
    assert(out(2L).features.isEmpty && out(3L).features.isEmpty)
  }

  test("PpmFeatureDecoder and PpmPool2x2Decoder match hand arithmetic") {
    // 2x2 image with known channel bytes -> one pooled cell
    val raster = Array[Byte](
      10, 20, 30,   40, 50, 60,
      70, 80, 90,  100, 110, 121)
    val payload = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ raster
    val f = Multimodal.PpmFeatureDecoder.decode(payload, Map.empty)
    val lumas = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 121))
      .map { case (r, g, b) => (299 * r + 587 * g + 114 * b) / 1000 }
    assert(f.toSeq == Seq[Float](2f, 2f, 10 + 40 + 70 + 100, 20 + 50 + 80 + 110,
      30 + 60 + 90 + 121, lumas.sum.toFloat, lumas.min.toFloat, lumas.max.toFloat))
    val p = Multimodal.PpmPool2x2Decoder.decode(payload, Map.empty)
    // truncating per-channel mean: b channel (30+60+90+121)/4 = 75 exactly via trunc
    assert(p.toSeq == Seq[Float]((10 + 40 + 70 + 100) / 4,
      (20 + 50 + 80 + 110) / 4, (30 + 60 + 90 + 121) / 4))
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
