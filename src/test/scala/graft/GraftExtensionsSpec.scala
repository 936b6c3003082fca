package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: the custom expressions usable from
  * spark.sql via SparkSessionExtensions.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // the shared test session already exists, so withExtensions would be
  // ignored by getOrCreate — use the imperative registration path
  private lazy val spark: SparkSession = {
    val s = SparkSpecBase.spark
    GraftExtensions.register(s)
    s
  }

  test("graft_* functions are callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  graft_shingles('a b c d', 3) AS sh,
        |  size(graft_minhash(graft_shingles('a b c d', 3), 16)) AS k,
        |  graft_simhash(array('x', 'y')) AS sim,
        |  graft_vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot
        |""".stripMargin).head()
    assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(row.getInt(1) == 16)
    assert(row.getDouble(3) == 11.0)
    // SQL results equal the Column-API results
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaApi = Seq("a b c d").toDF("t")
      .select(graft.text.Dedup.minhashSignature(
        graft.text.TextFunctions.shingles(col("t"), 3), 16))
      .head().getSeq[Long](0)
    val viaSql = spark.sql("SELECT graft_minhash(graft_shingles('a b c d', 3), 16)")
      .head().getSeq[Long](0)
    assert(viaApi == viaSql)
  }
}
