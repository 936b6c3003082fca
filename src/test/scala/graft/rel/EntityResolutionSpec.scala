package graft.rel

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** Pins for the entity-resolution pipeline beyond what the DuckDB
  * oracle already hash-checks: the blocking-recall audit (does noun
  * blocking lose pairs the full brute force finds?) and the transitive
  * structure the clusters must carry.
  */
class EntityResolutionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("noun blocking loses nothing vs full-name brute force at lev<=2") {
    // the classic blocking-recall audit: every full-name pair within
    // edit distance 2 must also be found by the blocked pair scan.
    // (Name vocab is 'adj noun'; a cross-noun pair needs >= 3 edits on
    // this corpus, so the block key is lossless at this threshold —
    // that is a property of the data the spec pins, not an assumption.)
    val names = Tables.part(spark, dir).select("p_name").distinct()
    val brute = names.as("a").join(names.as("b"),
        col("a.p_name") < col("b.p_name") &&
          levenshtein(col("a.p_name"), col("b.p_name")) <= 2)
      .select(col("a.p_name").as("x"), col("b.p_name").as("y"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val blocked = SparkEntry.queries("er_blocked_match")(spark, dir)
      .select(col("name_a"), col("name_b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(brute == blocked,
      s"blocking recall broke: brute-only=${brute -- blocked}, blocked-only=${blocked -- brute}")
  }

  test("clusters are transitively closed: the cold/old/red/new chain merges per noun") {
    // cold<->old is 1 edit and old<->red / new<->red are 2, but
    // cold<->new is 3 — only CLOSURE puts all four in one entity. Every
    // noun must show exactly one 4-name entity (rep = lexicographic
    // min 'cold <noun>') plus singletons for the other adjectives.
    val rows = SparkEntry.queries("er_clusters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byNoun = rows.groupBy(_._1)
    assert(byNoun.nonEmpty)
    byNoun.foreach { case (noun, entities) =>
      val quad = entities.filter(_._3 == 4L)
      assert(quad.length == 1 && quad.head._2 == s"cold $noun",
        s"noun $noun: expected one 4-name entity 'cold $noun', got ${entities.mkString(", ")}")
      assert(entities.filter(_._3 == 1L).length == entities.length - 1,
        s"noun $noun: non-chain adjectives must stay singletons: ${entities.mkString(", ")}")
    }
  }
}
