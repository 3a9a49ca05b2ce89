package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.TopKPairs

/** Property-based laws for the custom aggregation buffers. Spark is
  * free to partition input arbitrarily, partial-aggregate map-side,
  * and merge buffers in ANY grouping/order — an aggregator whose
  * merge isn't associative-commutative-with-identity returns
  * partition-layout-dependent answers at scale and no example-based
  * spec will reliably catch it. These laws are exactly the contract
  * the B37/D5/D6/D7 top-k shuffle shape relies on.
  */
class AggregatorLawsSpec extends AnyFunSuite {

  private val agg = TopKPairs(3)

  private def assertHolds(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private def reference(xs: List[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(3)

  private val pair: Gen[(Double, Long)] = for {
    v <- Gen.chooseNum(-100.0, 100.0)
    id <- Gen.chooseNum(0L, 50L)
  } yield (v, id)

  private val pairs: Gen[List[(Double, Long)]] = Gen.listOf(pair)

  private def fold(xs: List[(Double, Long)]): Seq[(Double, Long)] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("any partitioning + merge order equals the global sorted top-k") {
    assertHolds(Prop.forAll(pairs, Gen.chooseNum(1, 5)) { (xs, nParts) =>
      // split into nParts "map partitions", partial-reduce each, then
      // merge the buffers left-to-right — the two-phase aggregate path
      val parts =
        if (xs.isEmpty) List(Nil)
        else xs.grouped(math.max(1, xs.length / nParts)).toList
      val merged = parts.map(fold).reduce(agg.merge)
      agg.finish(merged) == reference(xs)
    })
  }

  test("merge is commutative and associative on arbitrary buffers") {
    assertHolds(Prop.forAll(pairs, pairs, pairs) { (a, b, c) =>
      val (ba, bb, bc) = (fold(a), fold(b), fold(c))
      agg.merge(ba, bb) == agg.merge(bb, ba) &&
      agg.merge(agg.merge(ba, bb), bc) == agg.merge(ba, agg.merge(bb, bc))
    })
  }

  test("zero is the merge identity") {
    assertHolds(Prop.forAll(pairs) { xs =>
      val b = fold(xs)
      agg.merge(b, agg.zero) == b && agg.merge(agg.zero, b) == b
    })
  }

  private val kmv = graft.expressions.KmvSketch(4)
  private val hashes: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 30L))
  private def kfold(xs: List[Long]): Seq[Long] =
    xs.foldLeft(kmv.zero)(kmv.reduce)

  test("KMV sketch: any partitioning equals distinct-sorted bottom-k") {
    assertHolds(Prop.forAll(hashes, Gen.chooseNum(1, 5)) { (xs, nParts) =>
      val parts =
        if (xs.isEmpty) List(Nil)
        else xs.grouped(math.max(1, xs.length / nParts)).toList
      val merged = parts.map(kfold).reduce(kmv.merge)
      kmv.finish(merged) == xs.distinct.sorted.take(4)
    })
  }

  test("KMV sketch merge is commutative, associative, and IDEMPOTENT") {
    assertHolds(Prop.forAll(hashes, hashes) { (a, b) =>
      val (ba, bb) = (kfold(a), kfold(b))
      kmv.merge(ba, bb) == kmv.merge(bb, ba) &&
      // idempotence: re-merging a buffer (a replayed micro-batch
      // after restart) cannot move the sketch
      kmv.merge(ba, ba) == ba &&
      kmv.merge(kmv.merge(ba, bb), bb) == kmv.merge(ba, bb)
    })
  }

  // Misra–Gries: the E45/G27 contract is NOT value equality (retained
  // weights are legitimately order-dependent) but the retention
  // guarantee — every item with true frequency > N/k survives ANY
  // partitioning and merge order. A skewed alphabet makes heavy
  // hitters actually occur.
  private val mg = graft.expressions.MisraGries(4)
  private val tokens: Gen[List[String]] = Gen.listOf(
    Gen.frequency(8 -> Gen.const("hh"), 3 -> Gen.const("mid"),
      1 -> Gen.oneOf("a", "b", "c", "d", "e", "f")))

  test("Misra-Gries retains every item with frequency > N/k " +
    "under any partitioning and merge order") {
    assertHolds(Prop.forAll(tokens, Gen.chooseNum(1, 5)) { (xs, nParts) =>
      val parts =
        if (xs.isEmpty) List(Nil)
        else xs.grouped(math.max(1, xs.length / nParts)).toList
      val merged = parts
        .map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
      val out = mg.finish(merged)
      val truth = xs.groupBy(identity)
        .collect { case (t, os) if os.size * 4 > xs.size => t }
      truth.forall(out.contains) &&
      out.size <= 3 && out == out.sorted   // ≤ k−1, deterministic order
    })
  }
}
