package graft

import graft.cte.CteAnalytics
import graft.functions.{LinAlg, PolyFit2D, TextKernels}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks for the driver-side kernels (SURVEY.md §5 item 3). */
object KernelProps extends Properties("kernels") {

  private val epochList: Gen[List[Double]] =
    Gen.listOfN(12, Gen.choose(0, 2000).map(_.toDouble))

  property("combineEpochs output is sorted and within input range") =
    forAll(epochList) { es =>
      es.isEmpty || {
        val out = CteAnalytics.combineEpochs(es)
        out == out.sorted &&
        out.forall(e => e >= es.min - 15 && e <= es.max + 15)
      }
    }

  property("combineEpochs preserves isolated epochs exactly") =
    forAll(Gen.listOfN(6, Gen.choose(0, 50).map(_ * 100.0))) { es =>
      // all gaps ≥ 100 > 30 ⇒ nothing merges
      val d = es.distinct.sorted
      CteAnalytics.combineEpochs(d) == d
    }

  private val hashArr: Gen[Array[Long]] =
    Gen.listOf(Gen.choose(0L, 1000000L)).map(_.distinct.sorted.toArray)

  property("sorted and hashed intersection counts agree with set semantics") =
    forAll(hashArr, hashArr) { (a, b) =>
      val want = a.toSet.intersect(b.toSet).size
      TextKernels.sortedIntersectCount(a, b) == want &&
      TextKernels.intersectCount(a, b) == want
    }

  property("polyhash stays in [0, P) and matches the reference fold") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h = TextKernels.polyhash(s)
      val want = s.foldLeft(0L)((acc, c) => (acc * 31 + c) % TextKernels.P)
      h == want && h >= 0 && h < TextKernels.P
    }

  property("simhash16 is a 16-bit value, invariant to token order") =
    forAll(Gen.listOfN(8, Gen.oneOf("table", "scan", "agg", "join", "row"))) { ws =>
      val h1 = TextKernels.simhash16(ws.mkString(" "))
      val h2 = TextKernels.simhash16(ws.reverse.mkString(" "))
      h1 >= 0 && h1 < 65536 && h1 == h2
    }

  property("minhash signature entries are (a·h+b) mod P minima") =
    forAll(Gen.listOfN(6, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))) { ws =>
      val text = ws.mkString(" ")
      val hs = TextKernels.wordShingleHashes(text)
      val sigs = TextKernels.minhashSigs(text)
      hs.isEmpty || graft.functions.TextPrims.minhashSeeds.zipWithIndex.forall {
        case ((a, b), k) => sigs(k) == hs.map(h => (a * h + b) % TextKernels.P).min
      }
    }

  private val coefGen: Gen[Array[Double]] =
    Gen.listOfN(9, Gen.choose(-2.0, 2.0)).map(_.toArray)

  property("polyfit on an exact grid surface recovers predictions") =
    forAll(coefGen) { c =>
      val pts = for (x <- 0 to 5; y <- 0 to 5)
        yield (x.toDouble, y.toDouble, PolyFit2D.eval(c, x.toDouble, y.toDouble))
      val agg = PolyFit2D.udaf
      val got = agg.finish(pts.foldLeft(agg.zero)(agg.reduce)).toArray
      pts.forall { case (x, y, z) =>
        math.abs(PolyFit2D.eval(got, x, y) - z) < 1e-6
      }
    }

  property("LinAlg solves diagonally-dominant SPD systems") =
    forAll(Gen.listOfN(9, Gen.choose(-1.0, 1.0))) { rs =>
      val n = 3
      val m = Array.tabulate(n, n)((i, j) =>
        (if (i == j) 5.0 else 1.0) + 0.1 * rs(i * n + j))
      // symmetrize
      val a = Array.tabulate(n, n)((i, j) => (m(i)(j) + m(j)(i)) / 2.0)
      val b = Array(rs(0), rs(1), rs(2))
      val x = LinAlg.solveMinNorm(a, b)
      val back = a.map(row => row.zip(x).map(t => t._1 * t._2).sum)
      back.zip(b).forall { case (h, w) => math.abs(h - w) < 1e-8 }
    }
}
