package graft.tick

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the rollup merge algebra. The rollup tier is
  * only correct if the per-bucket stat merge is associative AND
  * commutative — shuffle parallelism merges partials in arbitrary
  * order/grouping. (The reference's pyramid merge is positional and
  * violates commutativity for min — inverted compare, node.go:566-568 —
  * and for first/last, which it resolves by child order.)
  */
class MergePropertiesSpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (the scalatest-plus
    * bridge is not in the offline dependency set).
    */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Scala model of one rollup row's stats — mirrors Rollup.rollUp. */
  case class Stats(
      sum: BigDecimal, max: Double, min: Double,
      firstTs: Long, first: Double, lastTs: Long, last: Double, count: Long)

  def merge(a: Stats, b: Stats): Stats = Stats(
    a.sum + b.sum,
    math.max(a.max, b.max),
    math.min(a.min, b.min),
    math.min(a.firstTs, b.firstTs),
    if (a.firstTs <= b.firstTs) a.first else b.first,
    math.max(a.lastTs, b.lastTs),
    if (a.lastTs >= b.lastTs) a.last else b.last,
    a.count + b.count)

  private val genStats: Gen[Stats] = for {
    sum <- Gen.chooseNum(-1e6, 1e6).map(d => BigDecimal(math.round(d * 10000)) / 10000)
    max <- Gen.chooseNum(-1e6, 1e6)
    min <- Gen.chooseNum(-1e6, 1e6)
    fts <- Gen.chooseNum(0L, 1L << 60)
    f <- Gen.chooseNum(-1e6, 1e6)
    lts <- Gen.chooseNum(0L, 1L << 60)
    l <- Gen.chooseNum(-1e6, 1e6)
    n <- Gen.chooseNum(1L, 1000000L)
  } yield Stats(sum, max, min, fts, f, lts, l, n)

  implicit val arbStats: Arbitrary[Stats] = Arbitrary(genStats)

  test("stat merge is associative") {
    check(Prop.forAll { (a: Stats, b: Stats, c: Stats) =>
      merge(merge(a, b), c) == merge(a, merge(b, c))
    })
  }

  test("stat merge is commutative (given distinct first/last timestamps)") {
    check(Prop.forAll { (a: Stats, b: Stats) =>
      // ties on firstTs/lastTs are impossible post-upsert (ts unique per
      // index); condition the property accordingly
      Prop.propBoolean(a.firstTs != b.firstTs && a.lastTs != b.lastTs) ==>
        (merge(a, b) == merge(b, a))
    })
  }

  test("fixed-width bucketing: bucket <= ts < bucket + width, epoch-aligned") {
    val genSpec = for {
      count <- Gen.chooseNum(1, 10)
      unit <- Gen.oneOf(GroupUnit.Second, GroupUnit.Minute, GroupUnit.Hour, GroupUnit.Day)
    } yield GroupSpec(count, unit)
    check(Prop.forAll(genSpec, Gen.chooseNum(0L, 4102444800000000L)) { (spec, us) =>
      // model of GroupSpec.bucket's arithmetic on epoch-µs
      val widthUs = spec.unit.fixedSeconds * spec.count * 1000000L
      val bucket = (us / widthUs) * widthUs
      bucket % widthUs == 0 && bucket <= us && us < bucket + widthUs
    })
  }

  test("group spec parse-render roundtrip") {
    val gen = for {
      count <- Gen.chooseNum(1, 99)
      unit <- Gen.oneOf(GroupUnit.all)
      plural <- Gen.oneOf("", "s")
    } yield (count, unit, plural)
    check(Prop.forAll(gen) { case (count, unit, plural) =>
      GroupSpec.parse(s"$count${unit.name}$plural") == GroupSpec(count, unit)
    })
  }
}
