package graft

import graft.functions.{LinAlg, PolyFit2D}
import org.scalatest.funsuite.AnyFunSuite

class PolyFitSpec extends AnyFunSuite {

  private def fitLocal(pts: Seq[(Double, Double, Double)]): Array[Double] = {
    val agg = PolyFit2D.udaf
    val buf = pts.foldLeft(agg.zero)(agg.reduce)
    agg.finish(buf).toArray
  }

  test("exact recovery of a full-rank degree-2 surface") {
    val c = Array(1.0, -2.0, 0.5, 3.0, 0.25, -1.5, 2.0, 0.0, 0.75)
    val pts = for (x <- 0 to 5; y <- 0 to 5)
      yield (x.toDouble, y.toDouble, PolyFit2D.eval(c, x.toDouble, y.toDouble))
    val got = fitLocal(pts)
    c.zip(got).foreach { case (want, have) =>
      assert(math.abs(want - have) < 1e-8, s"want $want got $have")
    }
  }

  test("merge across partitions equals single-partition fit") {
    val c = Array(0.5, 1.0, 0.0, -1.0, 2.0, 0.0, 0.0, 0.0, 0.25)
    val pts = for (x <- 0 to 4; y <- 0 to 4)
      yield (x.toDouble, y.toDouble, PolyFit2D.eval(c, x.toDouble, y.toDouble))
    val agg = PolyFit2D.udaf
    val (l, r) = pts.splitAt(pts.length / 2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val whole = pts.foldLeft(agg.zero)(agg.reduce)
    agg.finish(merged).zip(agg.finish(whole)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }

  test("rank-deficient (single y value) returns min-norm fit that still predicts") {
    // All rows share y=2 — the reference's degenerate single-epoch case
    // (SURVEY.md §7.4 item 2): the Gram matrix has rank 3; lstsq-style
    // min-norm must still reproduce z on the data plane.
    val pts = for (x <- 1 to 8)
      yield (x.toDouble, 2.0, 3.0 + 0.5 * x - 0.25 * x * x)
    val got = fitLocal(pts)
    pts.foreach { case (x, y, z) =>
      assert(math.abs(PolyFit2D.eval(got, x, y) - z) < 1e-6,
        s"prediction at ($x,$y) = ${PolyFit2D.eval(got, x, y)}, want $z")
    }
  }

  test("NaN rows are ignored") {
    val pts = Seq((1.0, 1.0, 2.0), (2.0, 1.0, 3.0), (Double.NaN, 1.0, 9.0),
                  (3.0, 2.0, 4.0), (1.0, 2.0, 1.0), (4.0, 3.0, 5.0),
                  (2.0, 3.0, 2.0), (5.0, 2.0, 6.0), (3.0, 3.0, 3.0))
    val agg = PolyFit2D.udaf
    val withNaN = agg.finish(pts.foldLeft(agg.zero)(agg.reduce))
    val clean = agg.finish(
      pts.filterNot(_._1.isNaN).foldLeft(agg.zero)(agg.reduce))
    withNaN.zip(clean).foreach { case (a, b) => assert(a == b) }
  }

  test("empty group yields NaN coefficients") {
    val agg = PolyFit2D.udaf
    assert(agg.finish(agg.zero).forall(_.isNaN))
  }

  test("LinAlg solves a well-conditioned SPD system") {
    // A = M·Mᵀ for a random-ish fixed M; check A·x = b round trip.
    val m = Array(
      Array(2.0, 1.0, 0.0), Array(1.0, 3.0, 1.0), Array(0.0, 1.0, 4.0))
    val b = Array(1.0, 2.0, 3.0)
    val x = LinAlg.solveMinNorm(m, b)
    val back = m.map(row => row.zip(x).map { case (a, v) => a * v }.sum)
    back.zip(b).foreach { case (h, w) => assert(math.abs(h - w) < 1e-9) }
  }
}
