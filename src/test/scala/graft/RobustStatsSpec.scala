package graft

import org.apache.spark.sql.functions._

/** t15 (TF-IDF keywords) and dq2 (median/MAD outliers) against
  * brute-force recomputations at sf0.001. */
class RobustStatsSpec extends SparkSpecBase {

  test("dq2 median/MAD/outliers match the brute-force per-type values") {
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("event_id"),
        Exact.dec2(col("value")).cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (et, xs) =>
      val n = xs.length
      // the (n+1)/2-th element under (value, event_id) — selection, not
      // interpolation, mirroring the query's rule
      def sel(vs: Seq[(Double, Long)]): Double =
        vs.sortBy(identity).apply((n + 1) / 2 - 1)._1
      val med = sel(xs.map(x => (x._3, x._2)).toSeq)
      val mad = sel(xs.map(x => (math.abs(x._3 - med), x._2)).toSeq)
      val out = xs.count(x => math.abs(x._3 - med) > 3.0 * mad).toLong
      et -> ((n.toLong, med, mad, out))
    }
    val got = SparkEntry.queries("dq2_mad_outliers")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("t15 top terms are valid, ranked, and per-doc score-consistent") {
    val df = SparkEntry.queries("t15_tfidf_topterms")(spark, sfDir)
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // terms obey the token rule
    assert(rows.forall(_._3.matches("[a-z]{3,}")))
    // per-doc: ranks are 1..k, scores non-increasing, ties broken by term
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val sorted = xs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 > b._5 || (a._5 == b._5 && a._3 < b._3))
        case _ =>
      }
    }
    // determinism (integer scores => rerun cannot reorder)
    val again = SparkEntry.queries("t15_tfidf_topterms")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == again.toSeq)
  }

  test("w12 daily new/returning users match the brute-force replay") {
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ud = rows.toSet
    val firstDay = ud.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min }
    val days = ud.map(_._2).toSeq.sorted.distinct
    var cum = 0L
    val expected = days.map { d =>
      val dau = ud.count(_._2 == d).toLong
      val nw = firstDay.values.count(_ == d).toLong
      cum += nw
      (d, dau, nw, dau - nw, cum)
    }
    val got = SparkEntry.queries("w12_new_vs_returning")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the final cumulative count is the total distinct-user count
    assert(got.last._5 == firstDay.size.toLong)
  }

  test("d15 LSH recall audit is internally consistent and deterministic") {
    def run() = SparkEntry.queries("d15_lsh_recall")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val Seq((nDocs, nTruth, nCaught, recall)) = run()
    // sample really is the fixed-size md5 bottom-k slice (with ≥1
    // shingle); at sf0.001's 500 docs the 1000-cap covers the corpus, so
    // the audit prices ALL pairs here while staying constant-cost at any
    // larger SF
    val subset = operators.Dedup
      .signatures(Tables.documents(spark, sfDir)
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .limit(1000))
      .count()
    assert(nDocs == subset)
    // caught is a subset of truth; the ratio is their exact quotient
    assert(nCaught <= nTruth && nTruth > 0)
    assert(recall == nCaught.toDouble / nTruth.toDouble)
    // banding can't catch everything at a threshold this far below the
    // S-curve knee — if recall were 1.0 the audit would be vacuous
    assert(recall < 1.0)
    assert(run() == Seq((nDocs, nTruth, nCaught, recall)))
  }

  test("d16 retuned banding strictly dominates d15's recall at higher cost") {
    val Seq((nTruth, nCand62, nCaught62, recall62,
             nCand121, nCaught121, recall121)) =
      SparkEntry.queries("d16_lsh_tuned")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    // both configurations' caught sets are subsets of truth
    assert(nCaught62 <= nTruth && nCaught121 <= nTruth && nTruth > 0)
    // every 6×2 candidate pair also collides under 12×1 banding: a shared
    // (sig_{2i}, sig_{2i+1}) band implies shared single minhashes — so
    // 12×1 recall can never be below 6×2 recall (set containment, not
    // probability), and on this corpus it must be strictly better
    assert(recall121 > recall62,
      s"retune did not help: $recall121 <= $recall62")
    assert(nCaught121 >= nCaught62)
    // ... and the cost side is real: r=1 buckets collide far more often
    assert(nCand121 > nCand62)
    // d15 and d16 agree on the 6×2 configuration (same sample, same bands)
    val Seq((_, _, d15Caught, d15Recall)) =
      SparkEntry.queries("d15_lsh_recall")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(d15Caught == nCaught62 && d15Recall == recall62)
  }

  test("t15 brute-force parity on one document") {
    // recompute tf·idf_e9 for the lowest doc_id entirely in Scala
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").toSeq.filter(_.matches("[a-z]{3,}"))
    val tf = docs.map { case (id, t) =>
      id -> toks(t).groupBy(identity).map { case (k, v) => k -> v.size }
    }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val target = docs.map(_._1).min
    val expected = tf(target).toSeq.flatMap { case (term, f) =>
      val idf = math.floor(math.log((n + 1.0) / (dfreq(term) + 1.0)) * 1e9)
        .toLong
      if (idf > 0) Some((term, f.toLong, f * idf)) else None
    }.sortBy { case (t, _, sc) => (-sc, t) }.take(3)
    val got = SparkEntry.queries("t15_tfidf_topterms")(spark, sfDir)
      .where(col("doc_id") === target)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected, s"got $got expected $expected")
  }
}
