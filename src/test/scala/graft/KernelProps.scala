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

  // ---- chunk-kernel algebra: an ARBITRARY chunking of a bucket's
  // membership, run through the per-row chunk kernels with the upstream
  // contract applied (intra row per chunk; one cross row per chunk pair;
  // cross rows with an empty side dropped), must reproduce the
  // whole-bucket kernel EXACTLY — pair set and IEEE-bit jaccards. This
  // is the algebra Dedup's capped plans stand on, checked beyond the
  // few hand-built spec cases.

  private val member: Gen[(Long, Seq[Long])] = for {
    id <- Gen.choose(0L, 30L)
    hs <- Gen.nonEmptyListOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
  } yield (id, hs)

  private def membersGen: Gen[List[(Long, Seq[Long])]] =
    Gen.choose(2, 18).flatMap(n => Gen.listOfN(n, member))
      .map(_.groupBy(_._1).map(_._2.head).toList) // unique ids, like a bucket

  private def sortPairs(ps: Seq[(Long, Long, Double)]) =
    ps.sortBy(t => (t._1, t._2, t._3))

  property("chunked one-sided kernel == whole-bucket kernel, any chunking") =
    forAll(membersGen, Gen.choose(1, 6), Gen.long) { (mem, nch, seed) =>
      val rnd = new scala.util.Random(seed)
      val chunkOf = mem.map(m => m._1 -> rnd.nextInt(nch)).toMap
      val truth = sortPairs(TextKernels.bucketPairJaccards(mem, 0.0))
      val rows = for {
        cLo <- 0 until nch; cHi <- cLo until nch
        a = mem.filter(m => chunkOf(m._1) == cLo)
        b = if (cLo == cHi) Nil else mem.filter(m => chunkOf(m._1) == cHi)
        if cLo == cHi || (a.nonEmpty && b.nonEmpty) // the upstream filter
      } yield TextKernels.chunkPairJaccards(a, b, 0.0)
      val got = sortPairs(rows.flatten)
      // exact pair multiset (no duplicates: a doc lives in ONE chunk)
      got.map(t => (t._1, t._2)) == truth.map(t => (t._1, t._2)) &&
        got.zip(truth).forall { case (g, w) =>
          java.lang.Double.doubleToLongBits(g._3) ==
            java.lang.Double.doubleToLongBits(w._3) }
    }

  property("sorted-kernel jaccards == hash-kernel jaccards, bit-exact") =
    forAll(membersGen, Gen.choose(0, 3)) { (mem, split) =>
      // sorted-input contract: sort each member's hashes first
      val sortedMem = mem.map { case (id, hs) => (id, hs.distinct.sorted) }
      val (a, b0) = sortedMem.splitAt(
        if (split == 0) sortedMem.length else sortedMem.length / split.max(1))
      val b = if (b0.isEmpty) null else b0
      val hash = sortPairs(TextKernels.chunkPairJaccards(a, b, 0.0))
      val srt = sortPairs(TextKernels.chunkPairJaccardsSorted(a, b, 0.0))
      hash.map(t => (t._1, t._2)) == srt.map(t => (t._1, t._2)) &&
        hash.zip(srt).forall { case (g, w) =>
          java.lang.Double.doubleToLongBits(g._3) ==
            java.lang.Double.doubleToLongBits(w._3) }
    }

  private val taggedMember: Gen[(Long, Seq[Long], Boolean)] = for {
    (id, hs) <- member
    isNew <- Gen.oneOf(true, false)
  } yield (id, hs, isNew)

  property("chunked two-sided kernel == whole-bucket cross kernel, any chunking") =
    forAll(Gen.choose(2, 18).flatMap(n => Gen.listOfN(n, taggedMember))
             .map(_.groupBy(_._1).map(_._2.head).toList),
           Gen.choose(1, 6), Gen.long) { (mem, nch, seed) =>
      val rnd = new scala.util.Random(seed)
      val chunkOf = mem.map(m => m._1 -> rnd.nextInt(nch)).toMap
      def strip(xs: Seq[(Long, Seq[Long], Boolean)]) = xs.map(t => (t._1, t._2))
      val (nw, st) = mem.partition(_._3)
      val truth = sortPairs(TextKernels.bucketCrossJaccards(strip(nw), strip(st), 0.0))
      val rows = for {
        cLo <- 0 until nch; cHi <- cLo until nch
        a = mem.filter(m => chunkOf(m._1) == cLo)
        b = if (cLo == cHi) Nil else mem.filter(m => chunkOf(m._1) == cHi)
        if cLo == cHi || (a.nonEmpty && b.nonEmpty)
      } yield TextKernels.chunkCrossJaccards(a, b, 0.0)
      val got = sortPairs(rows.flatten)
      got.map(t => (t._1, t._2)) == truth.map(t => (t._1, t._2)) &&
        got.zip(truth).forall { case (g, w) =>
          java.lang.Double.doubleToLongBits(g._3) ==
            java.lang.Double.doubleToLongBits(w._3) }
    }

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

  private val smallStr: Gen[String] =
    Gen.choose(0, 140).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  property("bag lower bound never exceeds the true Levenshtein distance") =
    forAll(smallStr, smallStr) { (a, b) =>
      import org.apache.spark.unsafe.types.UTF8String
      val d = UTF8String.fromString(a)
        .levenshteinDistance(UTF8String.fromString(b))
      val members = Seq((1L, a), (2L, b))
      // threshold = true distance: the gated kernel must still emit the
      // pair (the gate may only skip pairs it can PROVE are past the
      // threshold), and with threshold = d - 1 it must emit nothing
      val atD = TextKernels.chunkPairEdits(members, null, d)
      val below = if (d == 0) Seq.empty
                  else TextKernels.chunkPairEdits(members, null, d - 1)
      atD == Seq((1L, 2L, d)) && below.isEmpty
    }

  property("chunkPairEdits over arbitrary chunkings == all-pairs threshold DP") =
    forAll(Gen.listOfN(10, smallStr), Gen.choose(1, 5)) { (texts, nch) =>
      import org.apache.spark.unsafe.types.UTF8String
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val maxDist = 30
      val want = (for {
        (a, i) <- docs.zipWithIndex; (b, j) <- docs.zipWithIndex
        if i < j
        d = UTF8String.fromString(a._2)
          .levenshteinDistance(UTF8String.fromString(b._2), maxDist)
        if d >= 0
      } yield (a._1, b._1, d)).toSet
      val chunks = docs.groupBy { case (id, _) => (id % nch).toInt }
      val intra = chunks.values.flatMap(c =>
        TextKernels.chunkPairEdits(c, null, maxDist))
      val cross = (for {
        ci <- chunks.keys; cj <- chunks.keys if ci < cj
      } yield TextKernels.chunkPairEdits(
        chunks(ci), chunks(cj), maxDist)).flatten
      (intra ++ cross).toSet == want
    }

  private val uniStr: Gen[String] =
    Gen.choose(0, 140).flatMap(n => Gen.stringOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\u00e9', '\u4e2d', '\u0416'))))

  property("boundedEdit == Spark's threshold levenshtein, any strings/k") =
    forAll(uniStr, uniStr, Gen.choose(0, 100)) { (a, b, k) =>
      import org.apache.spark.unsafe.types.UTF8String
      val want = UTF8String.fromString(a)
        .levenshteinDistance(UTF8String.fromString(b), k)
      TextKernels.boundedEdit(a.codePoints.toArray, b.codePoints.toArray, k) == want
    }

  property("boundedEdit handles supplementary-plane code points") =
    forAll(Gen.choose(0, 6), Gen.choose(0, 6), Gen.choose(0, 10)) { (i, j, k) =>
      import org.apache.spark.unsafe.types.UTF8String
      val a = "pre" + new String(Character.toChars(0x1F600 + i)) + "post"
      val b = "pre" + new String(Character.toChars(0x1F600 + j)) + "post"
      val want = UTF8String.fromString(a)
        .levenshteinDistance(UTF8String.fromString(b), k)
      TextKernels.boundedEdit(a.codePoints.toArray, b.codePoints.toArray, k) == want
    }

  property("edit kernel (Myers path) == Spark DP, emission-heavy, long strings") =
    forAll(Gen.listOfN(6, Gen.choose(0, 200).flatMap(n =>
        Gen.stringOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const('\u4e2d'))))),
      Gen.choose(0, 150)) { (texts, k) =>
      import org.apache.spark.unsafe.types.UTF8String
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val want = (for {
        (a, i) <- docs.zipWithIndex; (b, j) <- docs.zipWithIndex
        if i < j
        d = UTF8String.fromString(a._2)
          .levenshteinDistance(UTF8String.fromString(b._2), k)
        if d >= 0
      } yield (a._1, b._1, d)).toSet
      TextKernels.chunkPairEdits(docs, null, k).toSet == want
    }
}
