package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the mergeable aggregators, exercised over random
  * data, random partitionings, and random merge orders — pure JVM, no
  * Spark session. These are the properties that make the aggregators
  * correct on ANY cluster: Spark is free to split the input into
  * arbitrary partitions and merge partials in arbitrary order, so any
  * law violation here is a distributed-correctness bug that fixture
  * queries might never trip.
  */
class AggregatorLawsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def randomChunks[T](xs: Vector[T]): Vector[Vector[T]] = {
    val k = 1 + rnd.nextInt(6)
    if (xs.isEmpty) Vector(xs)
    else xs.grouped(math.max(1, (xs.size + k - 1) / k)).toVector
  }

  test("BoundedTopK equals sort.take(k) under any partitioning and merge order") {
    val agg = new TypedAggs.BoundedTopK[Int](5, Ordering.Int)
    (1 to 300).foreach { _ =>
      val xs = Vector.fill(rnd.nextInt(60))(rnd.nextInt(40) - 20)
      val partials = randomChunks(xs).map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === xs.sorted.take(5))
    }
  }

  test("MisraGries never loses a heavy hitter and never overcounts, merged in any order") {
    (1 to 200).foreach { _ =>
      val k = 4
      val mg = new TypedAggs.MisraGries(k)
      val n = 1 + rnd.nextInt(300)
      // Skewed alphabet: low ids are much more frequent (sqrt squashes).
      val xs = Vector.fill(n)("t" + math.sqrt(rnd.nextInt(100).toDouble).toInt)
      val partials = randomChunks(xs).map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(mg.zero)(mg.merge)
      val (cands, total) = mg.finish(merged)
      assert(total === n, "exact total must survive merging")
      assert(merged.counts.size <= k, "buffer must stay bounded")
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val threshold = n.toDouble / (k + 1)
      exact.foreach { case (t, c) =>
        if (c > threshold)
          assert(cands.contains(t),
            s"guaranteed heavy hitter '$t' (count $c of $n) missing from $cands")
      }
      merged.counts.foreach { case (t, c) =>
        assert(c <= exact.getOrElse(t, 0L), "stored counts must undercount")
        assert(c >= exact(t) - threshold,
          "undercount must stay within total/(k+1)")
      }
    }
  }
}
