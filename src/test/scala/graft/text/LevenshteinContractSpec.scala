package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The candidate CONTRACT of text_levenshtein_pairs (ADVICE r10): the
  * signature tier's recall boundaries are invisible to the driver
  * oracle (it uses the identical candidate scheme), so they are pinned
  * here against the r9 exhaustive length-band reference instead —
  * equivalence on the real corpus (the loud canary a testdata
  * regeneration would trip) plus explicit synthetic pins on BOTH sides
  * of each designed drop.
  */
class LevenshteinContractSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("signature tier == exhaustive length-band form on the real corpus") {
    // THE recall canary: the query's comment claims the Jaccard-0.6
    // prefix signature drops nothing on this corpus (every <=20-edit
    // pair keeps shingle Jaccard >= ~0.8). The driver oracle cannot
    // check that claim — it prunes candidates the same way — so a
    // regenerated corpus that plants a spread-edit pair would
    // silently vanish from BOTH engines and stay "green". This
    // equality against the exhaustive all-band reference fails
    // loudly instead.
    val docs = graft.Tables.documents(spark, sf001)
    val sig = pairs(TextQueries.levenshteinPairs(docs))
    val exh = pairs(TextQueries.levenshteinPairsExhaustive(docs))
    assert(sig.nonEmpty, "no <=20-edit pairs at all — vacuous equivalence")
    assert(sig == exh)
  }

  test("output is materialization-invariant: localCheckpoint == persist(DISK_ONLY)") {
    // the 100 TB deployment swap the materialization policy names:
    // localCheckpoint (block storage, no lineage fallback) vs
    // persist(DISK_ONLY) (recompute-on-loss). The pipeline's output
    // must not depend on which one pins the shingled doc table.
    import org.apache.spark.storage.StorageLevel
    val docs = graft.Tables.documents(spark, sf001)
    val viaCheckpoint = pairs(TextQueries.levenshteinPairs(docs))
    val persisted = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val viaPersist = pairs(TextQueries.levenshteinPairs(docs, df => {
      val p = df.persist(StorageLevel.DISK_ONLY)
      persisted += p
      p
    }))
    persisted.foreach(_.unpersist())
    assert(viaCheckpoint.nonEmpty)
    assert(viaPersist == viaCheckpoint)
  }

  test("contract boundaries: concentrated edits kept, spread edits and short docs dropped by design") {
    // pair (1,2): 3 edits inside ONE word of 40 — kills <=3 of 38
    // shingles, Jaccard ~0.85 >> 0.6 -> the tier MUST find it
    val foo = (0 until 40).map(i => f"foo$i%02d").mkString(" ")
    val fooEdit = foo.replace("foo05", "zzz05")
    // pair (3,4): 20 single-char edits spread over every other word —
    // every 3-shingle contains an edited word, intersection empty,
    // Jaccard 0 < 0.6 -> dropped BY DESIGN (the documented
    // approximation boundary of the signature tier; the exhaustive
    // reference still finds it at exactly 20 edits)
    val bar = (0 until 40).map(i => f"bar$i%02d").mkString(" ")
    val barEdit = (0 until 40).map(i =>
      if (i % 2 == 0) f"baz$i%02d" else f"bar$i%02d").mkString(" ")
    // pair (5,6): identical 2-token docs — no 3-shingles, filtered
    // before the signature pass -> dropped BY DESIGN
    val docs = Seq(
      (1L, foo), (2L, fooEdit),
      (3L, bar), (4L, barEdit),
      (5L, "hi there"), (6L, "hi there")).toDF("doc_id", "text")

    val sig = pairs(TextQueries.levenshteinPairs(docs))
    val exh = pairs(TextQueries.levenshteinPairsExhaustive(docs))

    // exhaustive ground truth sees all three planted pairs
    assert(exh.contains((1L, 2L, 3L)))
    assert(exh.contains((3L, 4L, 20L)))
    assert(exh.contains((5L, 6L, 0L)))
    // signature tier: keeps the concentrated-edit pair...
    assert(sig.contains((1L, 2L, 3L)))
    // ...and drops exactly the two designed classes. If either
    // assertion below starts failing, the tier got STRONGER — update
    // the query comment and the SURVEY §8 note before relaxing this.
    assert(!sig.exists(p => p._1 == 3L && p._2 == 4L),
      "spread-edit pair unexpectedly survived the Jaccard-0.6 signature")
    assert(!sig.exists(p => p._1 == 5L && p._2 == 6L),
      "sub-3-token pair unexpectedly survived the shingle filter")
    // and nothing else: no false positives among the cross pairs
    assert(sig == Seq((1L, 2L, 3L)))
  }
}
