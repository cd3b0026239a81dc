package graft

import org.apache.spark.sql.functions._

/** Pins the bucket-local LSH verification (one grouped exchange, pairs
  * verified inside the task) to the textbook formulation it replaced
  * (band-bucket self-join + per-candidate shingle joins): same pair
  * set, bitwise-identical jaccards. The rewrite exists because hot
  * buckets make candidate ROWS quadratic in bucket population and the
  * textbook join ships both shingle arrays on every candidate row
  * (~70 GB of exchange at 500k docs); semantics must not move. */
class DedupBucketLocalSpec extends SparkSpecBase {

  private def textbookPairs(docs: org.apache.spark.sql.DataFrame) = {
    val base = graft.operators.Dedup.signatures(docs).persist()
    val banded = graft.operators.Dedup.bandsOf(base)
    val sh = base.select(col("doc_id"), col("hs"))
    val out = banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("inter", graft.functions.TextKernels
        .intersectCountUdf(col("hs_a"), col("hs_b")))
      .withColumn("jac",
        col("inter").cast("double") /
        (expr("size(hs_a)") + expr("size(hs_b)") - col("inter")).cast("double"))
      .filter(col("jac") >= expr("0.08")) // Dedup.jacThreshold
      .select("doc_a", "doc_b", "jac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    base.unpersist()
    out
  }

  test("bucket-local pair verification == textbook band join, bit-exact") {
    import spark.implicits._
    // a hot bucket (exact-dup class), a genuine near-dup pair reachable
    // through SEVERAL bands (distinct() must collapse identical jacs),
    // and unrelated singletons
    val hot = (0L until 40L).map(i =>
      (i, "shared boilerplate navigation header words " * 5 + s" tail$i"))
    val near = Seq(
      (900L, "a modestly different document body with some edits applied here and more text to shingle"),
      (901L, "a modestly different document body with some edits applied there and more text to shingle"))
    val lone = Seq(
      (950L, "completely unrelated text about astronomy detectors and charge transfer"),
      (951L, "another unrelated body mentioning parquet readers and shuffle sizes"))
    val docs = (hot ++ near ++ lone).toDF("doc_id", "text")

    val got = graft.operators.Dedup.nearDupPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val want = textbookPairs(docs)

    assert(got.length == want.length,
      s"pair-set size: got ${got.length}, textbook ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2, s"pair mismatch: $g vs $w")
      // IEEE-exact: same intersect kernel, same divide on both paths
      assert(java.lang.Double.doubleToLongBits(g._3) ==
             java.lang.Double.doubleToLongBits(w._3),
        s"jaccard drifted: $g vs $w")
    }
    // the planted near-dup survives; the hot bucket's pairs are present
    assert(got.exists(t => t._1 == 900L && t._2 == 901L))
    assert(got.count(t => t._1 < 40L && t._2 < 40L) > 0)
  }

  /** A bucket hotter than the chunk cap: 40 boilerplate docs share every
    * band bucket; chunkSize = 8 forces 5 chunks → 5 intra rows + 10
    * cross rows per bucket. The capped plan must emit the exact pair set
    * and jaccards of the uncapped one-row-per-bucket plan. */
  test("chunked bucket-local == uncapped plan on a forced mega-bucket") {
    import spark.implicits._
    val hot = (0L until 40L).map(i =>
      (i, "shared boilerplate navigation header words " * 5 + s" tail$i"))
    val near = Seq(
      (900L, "a modestly different document body with some edits applied here and more text to shingle"),
      (901L, "a modestly different document body with some edits applied there and more text to shingle"))
    val docs = (hot ++ near).toDF("doc_id", "text")

    def run(chunk: Int) = {
      val (pairs, base) =
        graft.operators.Dedup.nearDupPairsWithBase(docs, chunkSize = chunk)
      val out = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      base.unpersist()
      out
    }
    val capped = run(8)
    val uncapped = run(1 << 20)
    assert(capped.length == uncapped.length,
      s"pair-set size: capped ${capped.length}, uncapped ${uncapped.length}")
    capped.zip(uncapped).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2, s"pair mismatch: $g vs $w")
      assert(java.lang.Double.doubleToLongBits(g._3) ==
             java.lang.Double.doubleToLongBits(w._3), s"jaccard drifted: $g vs $w")
    }
    // the bound the cap exists for: a 120-member bucket split at
    // chunkSize 8 must never put a bucket-sized membership on one row.
    // Chunks are hash-assigned (expected 8, concentrated), so the
    // assertion allows generous imbalance (6×) while still proving the
    // row is chunk-sized, not bucket-sized.
    val big = (0L until 120L).map(i =>
      (i, "shared boilerplate navigation header words " * 5 + s" tail$i"))
      .toDF("doc_id", "text")
    val bigBase = graft.operators.Dedup.signatures(big).persist()
    val maxRow = graft.operators.Dedup.chunkedBucketMembers(
        graft.operators.Dedup.bandsOf(bigBase), bigBase, 8)
      .select((size(col("amem")) + size(col("bmem"))).as("m"))
      .agg(max(col("m"))).head().getInt(0)
    bigBase.unpersist()
    assert(maxRow <= 48,
      s"grouped row carries $maxRow members — chunk split not engaging " +
        s"(bucket population is 120; rows must stay chunk-sized)")
  }

  /** The self-probe fast path (reference equality — DocStream's
    * intra-batch probe, d21's within-batch sweep) runs the one-sided
    * machinery at half the exchange and half the kernel arithmetic; its
    * output contract must stay EXACTLY the two-sided plan's: every
    * qualifying ordered pair in both orientations, same-id excluded. */
  test("self-probe fast path == two-sided probe on identical content") {
    import spark.implicits._
    val hot = (0L until 30L).map(i =>
      (i, "shared boilerplate navigation header words " * 5 + s" tail$i"))
    val near = Seq(
      (900L, "a modestly different document body with some edits applied here and more text to shingle"),
      (901L, "a modestly different document body with some edits applied there and more text to shingle"))
    val lone = Seq(
      (950L, "completely unrelated text about astronomy detectors and charge transfer"))
    val sig = graft.operators.Dedup.signatures(
      (hot ++ near ++ lone).toDF("doc_id", "text")).persist()
    // same rows, different Dataset reference → forces the two-sided plan
    val copy = sig.select(sig.columns.map(col): _*)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2, t._3))
    for (chunk <- Seq(1 << 20, 6)) { // plain plan AND forced chunking
      val fast = norm(graft.operators.Dedup.probePairs(sig, sig,
        chunkSize = chunk))
      val twoSided = norm(graft.operators.Dedup.probePairs(sig, copy,
        chunkSize = chunk))
      assert(fast.length == twoSided.length,
        s"chunk=$chunk: fast ${fast.length} pairs, two-sided ${twoSided.length}")
      fast.zip(twoSided).foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2, s"chunk=$chunk pair: $g vs $w")
        assert(java.lang.Double.doubleToLongBits(g._3) ==
               java.lang.Double.doubleToLongBits(w._3),
          s"chunk=$chunk jaccard drifted: $g vs $w")
      }
      assert(!fast.exists(t => t._1 == t._2), "self-match leaked")
      // both orientations present (the ordered-pair contract)
      assert(fast.exists(t => t._1 == 900L && t._2 == 901L) &&
             fast.exists(t => t._1 == 901L && t._2 == 900L))
    }
    sig.unpersist(): Unit
  }

  /** Two-sided probe under the cap, including the redelivery case (same
    * doc_id on both sides must not self-match) and a store-only bucket
    * (pruned before the shingle join, must not affect results). */
  test("chunked two-sided probe == uncapped probe, asymmetric contract kept") {
    import spark.implicits._
    val mkHot = (r: Range, pfx: String) => r.map(i =>
      (i.toLong, "shared boilerplate navigation header words " * 5 + s" $pfx$i"))
    val batch = (mkHot(0 until 25, "t") ++ Seq(
      (800L, "a modestly different document body with some edits applied here and more text to shingle"))).toDF("doc_id", "text")
    val store = (mkHot(10 until 40, "t") ++ Seq( // ids 10..24 redelivered
      (801L, "a modestly different document body with some edits applied there and more text to shingle"),
      (950L, "completely unrelated store-only text about astronomy detectors and charge transfer"))).toDF("doc_id", "text")
    val nSig = graft.operators.Dedup.signatures(batch).persist()
    val sSig = graft.operators.Dedup.signatures(store).persist()

    def run(chunk: Int) =
      graft.operators.Dedup.probePairs(nSig, sSig, chunkSize = chunk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    val capped = run(6)
    val uncapped = run(1 << 20)
    assert(capped.length == uncapped.length,
      s"pair-set size: capped ${capped.length}, uncapped ${uncapped.length}")
    capped.zip(uncapped).foreach { case (g, w) =>
      assert(g == w, s"probe pair drifted: $g vs $w")
    }
    // redelivered ids never match themselves; orientation is (new, store)
    assert(!capped.exists(t => t._1 == t._2))
    assert(capped.exists(t => t._1 == 800L && t._2 == 801L))
    assert(!capped.exists(t => t._1 == 801L), "store docs must stay on the right")
    // live-bucket pruning (the serving-probe opt-in) composed with the
    // chunk cap must not change the pair set — pruning only removes
    // buckets that cannot produce a cross pair
    val pruned = graft.operators.Dedup
      .probePairs(nSig, sSig, chunkSize = 6, pruneToLiveBuckets = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(pruned.toSeq == capped.toSeq,
      "live-bucket pruning changed the probe's pair set")
    nSig.unpersist(); sSig.unpersist()
  }
}
