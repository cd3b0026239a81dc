package graft

/** d9's exact-duplicate flood guard: a class of c byte-identical
  * documents shares every band key, so without the pre-banding collapse
  * it floods one bucket into C(c,2) zero-distance Levenshtein pairs —
  * C(1000,2) = 499,500 for the class planted here. The guard keeps only
  * each class's smallest doc_id, so the class contributes NO
  * within-class pairs while genuine near-duplicates still surface. */
class DedupGuardSpec extends SparkSpecBase {

  test("d9 collapses a 1k exact-duplicate class before banding") {
    import spark.implicits._
    val dupText =
      "the same duplicated document body repeated verbatim across the corpus " * 3
    val distinct = Seq(
      (100001L, "a modestly different document body with some edits applied here"),
      (100002L, "a modestly different documnt body with some edits applied here"))
    val docs = ((0L until 1000L).map(i => (i, dupText)) ++ distinct)
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.editDistancePairs(docs).collect()
    // bounded: nothing within the exact class (one representative), only
    // cross-document near-dup pairs remain
    assert(pairs.length < 10, s"candidate flood: ${pairs.length} pairs")
    val nonReps = (1L until 1000L).toSet
    pairs.foreach { r =>
      assert(!nonReps.contains(r.getLong(0)) && !nonReps.contains(r.getLong(1)),
        s"pair touches a collapsed duplicate: $r")
    }
    // the planted near-dup (one-typo) pair still surfaces
    assert(pairs.exists(r =>
      r.getLong(0) == 100001L && r.getLong(1) == 100002L))
  }

  test("d9 collapses a shared-prefix different-tail class (boilerplate " +
       "header, the real-crawl flood)") {
    import spark.implicits._
    // every doc shares the first >120 chars (a site header) but has a
    // unique tail — md5(text) would collapse NOTHING here, yet the DP
    // only ever sees the identical prefix, so the class is pairwise
    // information-free; the md5(prefix) guard must reduce it to one
    // representative and emit no pairs at all
    val header = "boilerplate site header text repeated on every page " * 3
    val docs = (0L until 500L)
      .map(i => (i, header + s" unique article body number $i"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.editDistancePairs(docs).collect()
    assert(pairs.isEmpty,
      s"prefix-class flood: ${pairs.length} pairs from one boilerplate class")
  }

  test("d9 bucket-local kernel plan == textbook join plan, bit-exact, " +
       "including a forced hot bucket") {
    import spark.implicits._
    // near-dup families whose members band-collide (one-char edits keep
    // most 7-gram minhashes) plus enough same-family members to push one
    // band bucket past the chunk cap when it is lowered via the
    // SPARK_GRAFT_CHUNK_CAP measurement knob — here the default cap
    // stays, so the hot path is exercised by family size alone when the
    // cap is small; both plans must agree pair-for-pair regardless of
    // which grouping path engaged
    // 600 members > the default 512 chunk cap ⇒ the family's band
    // buckets split into chunk-pair rows, so the CHUNKED grouping (not
    // just the one-row fast path) is what the equivalence pins
    val fam = (0L until 600L).map { i =>
      (i, s"shared family document body with a tail marker $i and padding " +
        "words to clear the seven gram floor of the banding machinery")
    }
    val singles = Seq(
      (900L, "completely unrelated text one with its own vocabulary set"),
      (901L, "completely unrelated text two with its own vocabulary kit"))
    val docs = (fam ++ singles).toDF("doc_id", "text")
    def rows(dpFull: Boolean) =
      graft.operators.Dedup.editDistancePairs(docs, dpFull = dpFull)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val kernel = rows(dpFull = false)
    val join = rows(dpFull = true)
    assert(kernel == join, "d9 plans diverge")
    assert(kernel.nonEmpty, "planted near-dup family produced no pairs")
  }

  test("d6 kernel plan == join plan (both banding variants), bit-exact") {
    // (lang, source) in the band key removes exactly the pairs the
    // post-join block filter drops, and the bucket-local kernel's
    // intersect/divide is the join plan's arithmetic — all three
    // formulations must hash identically
    def rows(split: Boolean) =
      graft.operators.Dedup.d6Plan(spark, sfDir, splitByBlock = split)
        .collect().map(_.toSeq).toVector
    val a = rows(split = true)
    spark.catalog.clearCache()
    val b = rows(split = false)
    spark.catalog.clearCache()
    val k = graft.operators.Dedup.d6Kernel(spark, sfDir)
      .collect().map(_.toSeq).toVector
    spark.catalog.clearCache()
    assert(a == b, "d6 banding variants diverge")
    assert(k == a, "d6 kernel plan diverges from the join plan")
    assert(a.nonEmpty, "sf0.001 corpus produced no d6 pairs")
  }
}
