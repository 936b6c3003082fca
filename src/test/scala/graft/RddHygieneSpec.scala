package graft

import org.apache.spark.sql.functions._

/** Pins the harness storage sweep (RddHygiene): checkpoint blocks a
  * query creates are gone after the sweep, while caches that predate
  * it survive — the two directions the round-11 bench leak fix
  * depends on.
  */
class RddHygieneSpec extends SparkSpec {

  test("sweep drops the query's checkpoint blocks, spares pre-existing caches") {
    val sc = spark.sparkContext
    // a pre-existing cache (stand-in for a setup-built index artifact)
    val cached = spark.range(1000).toDF("id").persist()
    cached.count()
    val baseline = RddHygiene.ids(spark)
    assert(baseline.nonEmpty, "the persisted frame should be registered")

    // a checkpoint-pinning query (LPA localCheckpoints its adjacency)
    RddHygiene.sweptAfter(spark) {
      SparkEntry.queries("graph_label_propagation")(spark, sf0001).count()
    }
    assert(RddHygiene.ids(spark) == baseline,
      s"sweep left blocks behind: ${RddHygiene.ids(spark) -- baseline}")
    // the cache still serves (its storage was not swept)
    assert(cached.storageLevel.useMemory, "pre-existing cache was unpersisted")
    assert(cached.count() == 1000)
    cached.unpersist()
  }

  test("sweptAfter sweeps even when the body throws") {
    val baseline = RddHygiene.ids(spark)
    intercept[RuntimeException] {
      RddHygiene.sweptAfter(spark) {
        val pinned = spark.range(100).toDF("id").localCheckpoint()
        pinned.count()
        throw new RuntimeException("boom")
      }
    }
    assert(RddHygiene.ids(spark) == baseline,
      "a failing query must not leak its checkpoint blocks")
  }
}
