package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** The property that makes prefix filtering a different TIER from
  * LSH: candidate generation is EXACT. If two shingle sets have
  * Jaccard >= 0.9, the rarest-first prefix of each must overlap, so
  * the blocked join can never miss a true pair — the spec proves it
  * by comparing the query's output against the full O(n²) brute force.
  */
class PrefixFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("prefix filtering has zero false negatives vs full brute force at theta=0.9") {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        array_distinct(TextFunctions.shingles(col("text"), 3)).as("shset"))
      .where(size(col("shset")) > 0)
      .localCheckpoint()
    val sa = sh.toDF("a_id", "a_sh")
    val sb = sh.toDF("b_id", "b_sh")
    val brute = sa.join(sb, col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("uni", size(col("a_sh")) + size(col("b_sh")) - col("inter"))
      .where(col("inter") * 10 >= col("uni") * 9 && col("uni") > 0)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = SparkEntry.queries("dedup_prefix_filter")(spark, dir)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus must carry real near-dup structure")
    assert(filtered == brute,
      s"missed=${brute -- filtered} spurious=${filtered -- brute}")
  }
}
