package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom filter has no false negatives and a bounded FP rate") {
    val members = (0L until 5000L).map(_ * 31 + 7).toArray
    val (words, mBits) = Bloom.build(members)
    assert(members.forall(Bloom.mightContain(words, mBits, 7, _)),
      "every inserted key must pass")
    // disjoint probe set: FP rate at 16 bits/key, k=7 is ~0.8%; pin 3%
    val probes = (1L to 20000L).map(_ * 31 + 8)
    val fps = probes.count(Bloom.mightContain(words, mBits, 7, _))
    assert(fps.toDouble / probes.size < 0.03,
      s"false-positive rate too high: $fps / ${probes.size}")
  }

  test("codegen probe agrees with the interpreted builder twin") {
    val members = (0L until 1000L).map(i => i * i + 3).toArray
    val (words, mBits) = Bloom.build(members)
    val keys = ((0L until 4000L) ++ members).toDF("key")
    val viaExpr = keys
      .select(col("key"), Bloom.mightContainCol(col("key"), words, mBits).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    keys.collect().map(_.getLong(0)).foreach { k =>
      assert(viaExpr(k) == Bloom.mightContain(words, mBits, 7, k),
        s"codegen/interpreted disagree on key $k")
    }
  }

  test("no false negatives on random key sets (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genKeys = for {
      n <- Gen.chooseNum(1, 2000)
      keys <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield keys.distinct.toArray
    val prop = Prop.forAll(genKeys) { keys =>
      val (words, mBits) = Bloom.build(keys)
      keys.forall(Bloom.mightContain(words, mBits, 7, _))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("non-LONG probe key is rejected at analysis time") {
    // nullSafeEval casts the key to Long: without the input-type pin an
    // Int key would CCE interpreted but silently widen under codegen
    val (words, mBits) = Bloom.build(Array(1L, 2L))
    val intKeys = Seq(1, 2, 3).toDF("key") // IntegerType
    val ex = intercept[Exception] {
      intKeys.select(Bloom.mightContainCol(col("key"), words, mBits)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"),
      s"expected an analysis-time type error, got: ${ex.getMessage}")
    // the properly-typed path still works after an explicit cast
    val ok = intKeys.select(
      Bloom.mightContainCol(col("key").cast("long"), words, mBits).as("hit")).collect()
    assert(ok.map(_.getBoolean(0)).toSeq.take(2).forall(identity))
  }

  test("pruneByKeys enforces the bounded-collect contract") {
    val dim = (0L until 100L).toDF("k")
    val fact = (0L until 10L).toDF("key")
    val ex = intercept[IllegalArgumentException] {
      Bloom.pruneByKeys(fact, col("key"), dim, maxKeys = 50)
    }
    assert(ex.getMessage.contains("bounded-collect"))
    // within bounds it prunes to exactly the member set (no FNs)
    val pruned = Bloom.pruneByKeys(fact, col("key"), dim, maxKeys = 200)
    assert(pruned.count() == 10L)
  }

  test("join_bloom_prune keeps exactly the exact-join result") {
    val bloomed = graft.SparkEntry.queries("join_bloom_prune")(spark, sf001)
    val plain = graft.Tables.orders(spark, sf001)
      .where(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00")))
      .join(graft.Tables.lineitem(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n_items"))
    assert(bloomed.count() == plain.count(), "bloom prune must not change the join result")
    assert(bloomed.count() > 0, "the probe window must be non-empty")
    // the probe must sit in the scan stage: physical plan filters
    // lineitem with the bloom expression before any join
    val phys = bloomed.queryExecution.executedPlan.toString
    assert(phys.toLowerCase.contains("bloommightcontain"),
      "bloom probe missing from the physical plan")
  }
}
