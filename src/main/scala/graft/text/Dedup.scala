package graft.text
import graft.Pinned.PinnedOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora (SURVEY §2.C), all
  * expressed as shuffle-partitioned DataFrame plans — no cross joins,
  * no driver-side loops — so each scales linearly with executors:
  *
  *  - exact: hash-groupBy on the text digest; O(N) with one shuffle.
  *  - MinHash + LSH banding: shingle → k-permutation signature → band
  *    buckets → equi-join inside buckets only → exact-Jaccard verify
  *    of candidates. The candidate join is keyed by (band, bucket), so
  *    at 100 TB the pair space never materializes — only colliding
  *    bucket members join.
  *  - SimHash: 64-bit sign-aggregated token-hash fingerprint; near-dup
  *    iff Hamming distance ≤ r. Banded by bit-slices for the same
  *    bucket-join trick.
  *  - n-gram Jaccard: the exact verifier, usable standalone as a
  *    brute-force tier on bounded subsets.
  */
object Dedup {

  // ---- exact ----

  /** One survivor (min idCol) per distinct text; `n_dups` counts the
    * collapsed group. GroupBy on the 128-bit digest, not the text:
    * shuffle keys stay 16 bytes however long the documents are.
    */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text.cast("binary")).as("digest"))
      .agg(min(id).as("survivor_id"), count(lit(1)).as("n_dups"))

  // ---- MinHash / LSH ----

  /** k minhash values per doc. Base hash is xxhash64 of the shingle
    * folded into [0, 2^31); the k permutations are affine maps
    * (a_i * h + b_i) mod p, p = 2^31 - 1, with constants derived from a
    * splitmix-style scramble — deterministic, no RNG state, and every
    * intermediate fits a 64-bit long (ANSI mode rejects overflow).
    */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    graft.functions.GraftExpressions.minhash_sig(shingleSet, k)

  /** docs(id, sig) -> candidate pairs (a_id < b_id) colliding in ≥1 of
    * `bands` LSH bands. Join is strictly within (band, bucket) keys.
    */
  def lshCandidatePairs(docs: DataFrame, id: String, sig: String, bands: Int): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    // precondition (enforced by nearDedupSurvivors): bands divides the
    // signature length — bands > k would make every band slice empty
    // and collapse all docs into one bucket (the O(N^2) blowup this
    // pipeline exists to avoid)
    val rowsPerBand = expr(s"size(s) DIV $bands")
    val banded = docs
      .select(col(id).as("doc"), col(sig).as("s"))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket", xxhash64(col("band"),
        slice(col("s"), col("band") * rowsPerBand + lit(1), rowsPerBand)))
      .select("doc", "band", "bucket")
    val a = banded.toDF("a_id", "band", "bucket")
    val b = banded.toDF("b_id", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  // ---- exact n-gram Jaccard (verifier / brute-force tier) ----

  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    // two empty sets share NOTHING, not everything: 1.0 here would mark
    // every too-short-to-shingle document a duplicate of all the others
    when(union === 0, lit(0.0)).otherwise(inter.cast("double") / union)
  }

  /** Verify candidate pairs against exact shingle-set Jaccard; keeps
    * pairs with similarity ≥ threshold. `shingled` must carry (id,
    * shingle-set) — it is joined twice, once per side.
    */
  def verifyPairs(
      candidates: DataFrame, // a_id, b_id
      shingled: DataFrame,   // id, shset
      threshold: Double): DataFrame = {
    val sa = shingled.toDF("a_id", "a_sh")
    val sb = shingled.toDF("b_id", "b_sh")
    candidates
      .join(sa, "a_id").join(sb, "b_id")
      .withColumn("jaccard", jaccard(col("a_sh"), col("b_sh")))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** The Σ df² shingle-pair space behind the exact verifiers
    * (dedup_ngram_jaccard / dedup_threshold_profile / text_containment
    * all build this shape inline), with the designed df-CAP
    * degradation tier: `maxDf = Some(cap)` drops every shingle whose
    * document frequency exceeds `cap` BEFORE the self-join, bounding
    * the join's work at Σ_{df≤cap} df² ≤ cap · (corpus shingle mass)
    * — linear in the corpus for a fixed cap — where the uncapped join
    * is corpus-quadratic on any head shingle (at 100 TB of real web
    * text, common 3-shingles have corpus-linear df; the uncapped tier
    * would die on them). Capping redefines each document's shingle
    * set as its capped subset (hot shingles leave the intersection
    * AND the set sizes), the standard stop-shingle-dropped
    * approximation: Jaccard over capped sets, exact for every pair
    * whose shingles all sit under the cap. The uncapped form remains
    * available as `maxDf = None` (identical output when
    * cap > max observed df — pinned in DedupSpec).
    *
    * Returns (a_id, b_id, inter, na, nb) for every pair sharing ≥1
    * surviving shingle: inter = |A∩B|, na/nb = capped set sizes.
    */
  def shinglePairStats(
      docs: DataFrame, text: Column, id: Column,
      shingleN: Int, maxDf: Option[Long]): DataFrame = {
    val sh = docs.select(id.as("doc_id"),
      array_distinct(TextFunctions.shingles(text, shingleN)).as("shset"))
    val ex0 = sh.select(col("doc_id"), explode(col("shset")).as("s"))
    val ex = maxDf match {
      case Some(cap) =>
        // df pass first: one extra shuffle on the shingle key, the
        // price of the bounded join. The keep-set join is shingle-
        // keyed (same key as the pair join), so AQE coalesces the
        // exchanges; no row ever fans out before the cap applies.
        val keep = ex0.groupBy("s").agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select("s")
        // re-fix column ORDER: the equi-join hoists the key column
        // first, and the positional toDF renames below depend on
        // (doc_id, s)
        ex0.join(keep, "s").select("doc_id", "s")
      case None => ex0
    }
    // the exploded (and possibly capped) shingle table feeds THREE
    // consumers (both pair-join sides + the set sizes) — pin it once
    // instead of re-shingling the corpus per consumer (the levenshtein
    // shingle-table policy; O(shingle mass) rows, swept post-query by
    // the harness; 100 TB substitute is persist(DISK_ONLY))
    val exP = ex.pinned
    val sz = exP.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val p = exP.toDF("a_id", "s").join(exP.toDF("b_id", "s"), "s")
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    p.join(sz.toDF("a_id", "na"), "a_id")
      .join(sz.toDF("b_id", "nb"), "b_id")
      .select("a_id", "b_id", "inter", "na", "nb") // stable order (joins hoist keys)
  }

  /** Substring-level duplicate REMOVAL (Lee et al. 2022): every token
    * position covered by a 10-token span appearing in ≥ 2 distinct
    * input documents is cut, and each document is rebuilt from the
    * surviving tokens in order. Returns the FULL input corpus as
    * (doc_id, n_tokens, n_removed, cleaned). Extracted from the
    * dedup_span_removal query body so the pipeline-interlock spec can
    * run the identical semantics over a DEDUPED corpus (the span-dup
    * relation depends on the whole input set — removing docs can only
    * shrink it, the composition law PipelineIntegrationSpec pins).
    * Scale shape: all O(total tokens) — span agg + coverage explode +
    * (doc, pos) anti-join; only TOUCHED docs pay the per-token rebuild.
    */
  def spanRemoval(docs: DataFrame, text: Column, id: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"), TextFunctions.tokens(text).as("t"))
    val spans = toks.where(size(col("t")) >= 10)
      .select(col("doc_id"), posexplode(transform(
          sequence(lit(1), size(col("t")) - 9),
          i => concat_ws(" ", slice(col("t"), i, lit(10))))).as(Seq("i0", "span")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("span"))
    val dup = spans.groupBy("span")
      .agg(countDistinct("doc_id").as("nd")).where(col("nd") >= 2)
      .select("span")
    val cov = spans.join(dup, "span")
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + 9)).as("pos"))
      .distinct()
    // only TOUCHED docs pay the per-token explode + ordered rebuild
    // (at 100 TB the contaminated slice is a sliver of the corpus);
    // the untouched majority passes through as one per-row concat —
    // identical output, since an uncovered doc's rebuild IS its
    // token join
    val covDocs = cov.select("doc_id").distinct()
    val rb = toks.join(covDocs, "doc_id")
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("w"))
      .join(cov, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w"))).as("cleaned"))
    val touched = toks.join(covDocs, "doc_id")
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(rb, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
    val untouched = toks.join(covDocs, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        lit(0L).as("n_removed"), concat_ws(" ", col("t")).as("cleaned"))
    touched.unionByName(untouched)
  }

  /** Directional containment pairs over (optionally df-capped)
    * shingle sets: emits (sub_id, super_id, containment) for every
    * ordered pair with |A∩B| · 100 ≥ minPct · |A| — doc A a near-
    * subset of B (quote/excerpt detection; Jaccard misses these when
    * B is much longer). Both orientations derive from ONE
    * [[shinglePairStats]] pass via a 2-way explode, so the Σ df²
    * shingle join is planned and executed exactly once (a UNION ALL
    * of two selects over the stats would run the join twice).
    *
    * `maxDf = Some(cap)` is the 100 TB degradation tier — containment
    * over CAPPED sets (hot shingles leave the intersection and |A|),
    * the asymmetric analog of the dedup_jaccard_capped semantics:
    * exact for every pair whose shingles all sit under the cap, and
    * identical to the uncapped form when cap > max observed df
    * (pinned in DedupSpec).
    */
  def containmentPairs(docs: DataFrame, text: Column, id: Column,
      shingleN: Int, minPct: Int, maxDf: Option[Long]): DataFrame = {
    val st = shinglePairStats(docs, text, id, shingleN, maxDf)
    st.select(explode(array(
        struct(col("a_id").as("sub_id"), col("b_id").as("super_id"),
          col("inter"), col("na").as("n")),
        struct(col("b_id").as("sub_id"), col("a_id").as("super_id"),
          col("inter"), col("nb").as("n")))).as("r"))
      .select("r.*")
      .where(col("inter") * 100 >= col("n") * minPct)
      .select(col("sub_id"), col("super_id"),
        (col("inter").cast("double") / col("n")).as("containment"))
  }

  /** Full near-dup pipeline: docs minus every doc that has a verified
    * near-duplicate with a smaller id. Returns surviving ids.
    */
  def nearDedupSurvivors(
      df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(bands <= k && k % bands == 0,
      s"bands ($bands) must divide the signature length k ($k)")
    val shingled = df
      .select(id.as("id"), array_distinct(TextFunctions.shingles(text, shingleN)).as("shset"))
      // shingle-less docs (< shingleN tokens) have no n-gram identity:
      // they can't be near-dups, and their all-equal signatures would
      // otherwise collide pairwise in every band
      .where(size(col("shset")) > 0)
      // reused three times below (signatures + both verify sides):
      // materialize once instead of re-shingling the corpus per consumer
      .pinned
    val sigs = shingled.select(col("id"), minhashSignature(col("shset"), k).as("sig"))
    val cands = lshCandidatePairs(sigs, "id", "sig", bands)
    val dups = verifyPairs(cands, shingled, threshold)
      .select(col("b_id").as("id")).distinct() // the larger id of each pair dies
    df.select(id.as("id")).join(dups, Seq("id"), "left_anti")
  }

  // ---- portable LSH tier (the streaming dedup gate) ----

  /** Modulus of the portable minhash permutations: 2^31 − 1 (prime).
    * Shared verbatim with the DuckDB oracle.
    */
  val PortableP: Long = 2147483647L

  /** Affine-permutation constants (a_i, b_i) of the PORTABLE minhash
    * tier — k = 8 minhashes, banded 2-per-band into 4 LSH bands.
    * Fixed literals shared verbatim with the DuckDB oracle (the
    * engine's production tier keeps the k=64 xxhash64 signatures of
    * [[minhashSignature]]; this tier trades signature width for a
    * hash the oracle can replay — the dedup_simhash md5-15-hex
    * precedent). Every a_i < 2^31, so a·h + b < 2^62 stays in BIGINT
    * on both engines.
    */
  val PortablePerms: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (214013L, 2531011L), (69069L, 362437L),
    (1664525L, 1013904223L), (22695477L, 7777L), (134775813L, 1L),
    (1103515211L, 54321L), (48271L, 159L))

  /** Portable per-shingle base hash: first 15 md5 hex chars as a
    * BIGINT (60 bits) — `CAST(concat('0x', substr(md5(s),1,15)) AS
    * BIGINT)` on the DuckDB side.
    */
  private def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** docs(text) → (doc_id, source, hsh): the HASHED shingle-set
    * representation the portable tier runs on — distinct 60-bit base
    * hashes of the 3-shingles. Set intersections over `hsh` equal
    * shingle-set intersections up to md5-60-bit collisions (~1e-14
    * per pair), and the array is ~10× smaller than the shingle
    * strings — what makes the verify side broadcastable. Docs too
    * short to shingle keep an EMPTY array (no n-gram identity).
    */
  def portableHashedShingles(docs: DataFrame, text: Column): DataFrame =
    docs.select(col("doc_id"), col("source"),
      array_distinct(transform(
        array_distinct(TextFunctions.shingles(text, 3)), h60(_))).as("hsh"))

  /** The portable tier's banding expression — 4 band keys (each the
    * band's two minhash values, underscore-joined) over a hashed
    * shingle-set column. ONE definition shared by the offline index
    * ([[portableBandedIndex]]) and the stream probe
    * ([[portableDedupProbe]]): the two sides must stay byte-identical
    * or the stream silently stops meeting its own index.
    */
  private def portableBandKeys(hsh: Column): Column = {
    val mins = PortablePerms.map { case (a, b) =>
      array_min(transform(hsh, h => ((h % PortableP) * a + b) % PortableP))
    }
    array((0 until PortablePerms.size / 2).map(i =>
      concat_ws("_", mins(2 * i), mins(2 * i + 1))): _*)
  }

  /** (id, hsh) rows → the 4-band portable LSH index (c_id, band,
    * key): key = the band's two minhash values, underscore-joined.
    * Empty-set docs are excluded — they have no LSH identity.
    */
  def portableBandedIndex(hashed: DataFrame, id: String): DataFrame =
    hashed.where(size(col("hsh")) > 0)
      .select(col(id).as("c_id"),
        posexplode(portableBandKeys(col("hsh"))).as(Seq("band", "key")))

  /** The dedup gate's probe plan, shared by the STREAMING gate and its
    * batch twin (the interlock law PipelineIntegrationSpec pins:
    * streamed drop set == batch drop set when drained): each probe
    * document banded with the portable minhash, band keys meeting the
    * corpus's prebuilt LSH index through a broadcast equi-join on
    * (band, key) — with `c_id < doc_id` so a doc never pairs with
    * itself or a later id: the drop rule is exactly
    * [[nearDedupSurvivors]]' "the larger id of each verified pair
    * dies" — then exact hashed-shingle Jaccard ≥ 4/5 verified on
    * CANDIDATES ONLY (integer cross-multiplied: no fp boundary).
    * Returns one row per probe doc: (doc_id, source, n_cand_rows,
    * is_dup).
    *
    * Scale shape: the stream never shuffles — banding is per-row, both
    * index sides broadcast (hashed sets are ~60 B/doc·shingle), and
    * the per-doc decision closes in one streaming aggregate. Past
    * broadcast limits the `tier` knob ([[graft.StaticTier]]) runs the
    * SAME plan as a shuffled stream-static join keyed on (band, key)
    * — bit-equality of the tiers is pinned in StaticTierSpec and the
    * streaming_dedup_gate_shuffled oracle gate.
    */
  def portableDedupProbe(probe: DataFrame, banded: DataFrame,
      hashedIdx: DataFrame,
      tier: graft.StaticTier = graft.StaticTier.Broadcast): DataFrame = {
    val ph = portableHashedShingles(probe, col("text"))
    val ex = ph
      .withColumn("bands",
        when(size(col("hsh")) > 0, portableBandKeys(col("hsh"))))
      .select(col("doc_id"), col("source"), col("hsh"),
        posexplode_outer(col("bands")).as(Seq("band", "key")))
    val bi = banded.toDF("c_id", "i_band", "i_key")
    val csh = hashedIdx.select(col("doc_id").as("c_id"), col("hsh").as("chs"))
    ex.join(graft.StaticTier.side(bi, tier),
        col("band") === col("i_band") && col("key") === col("i_key") &&
          col("c_id") < col("doc_id"), "left")
      .join(graft.StaticTier.side(csh, tier), Seq("c_id"), "left")
      .withColumn("inter", size(array_intersect(col("hsh"), col("chs"))).cast("long"))
      .withColumn("uni",
        size(col("hsh")).cast("long") + size(col("chs")) - col("inter"))
      .groupBy("doc_id", "source")
      .agg(
        sum(when(col("c_id").isNotNull, 1L).otherwise(0L)).as("n_cand_rows"),
        max(when(col("c_id").isNotNull && col("inter") * 5 >= col("uni") * 4,
          1L).otherwise(0L)).as("is_dup"))
  }

  // ---- SimHash ----

  /** 64-bit SimHash over the token multiset: bit j of the output is 1
    * iff the sum over tokens of ±1 (by bit j of xxhash64(token)) is
    * positive. Fused single-pass expression (64 per-bit HOF aggregates
    * would evaluate interpreted, 64 passes per doc).
    */
  def simhash(tokens: Column): Column =
    graft.functions.GraftExpressions.simhash64(tokens)

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: Hamming ≤ r implies (by
    * pigeonhole) equality on at least one of r+1 bit-slices — bucket on
    * each 16-bit slice, join within buckets, verify exact distance.
    */
  def simhashPairs(docs: DataFrame, id: String, sh: String, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3,
      s"maxHamming ($maxHamming) > 3 breaks the 4-slice pigeonhole guarantee: " +
        "pairs beyond distance 3 would be silently dropped")
    val slices = 4 // 16-bit slices of the 64-bit hash; catches r <= 3 exactly
    val sliceKeys = array((0 until slices).map(sl =>
      shiftright(col(sh), sl * 16).bitwiseAND(lit(0xffffL))): _*)
    val banded = docs.select(col(id).as("doc"), col(sh).as("h"), posexplode(sliceKeys))
      .withColumnRenamed("pos", "slice").withColumnRenamed("col", "key")
    val a = banded.toDF("a_id", "a_h", "slice", "key")
    val b = banded.toDF("b_id", "b_h", "slice", "key")
    a.join(b, Seq("slice", "key"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), hamming(col("a_h"), col("b_h")).as("dist"))
      .distinct()
      .where(col("dist") <= maxHamming)
  }
}
