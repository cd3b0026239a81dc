package graft

import graft.operators.{CorpusCuration, Dedup, Graph}
import org.apache.spark.sql.functions._

class CorpusCurationSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sfDir)
  // held-out "benchmark": the doc_id % 7 slice, as in d7
  private lazy val heldOut = docs.filter(col("doc_id") % 7 === 0)
  private lazy val train = docs.filter(col("doc_id") % 7 =!= 0)

  test("funnel is monotone and every stage's contract holds") {
    val cfg = CorpusCuration.Config()
    val (chunks, f) =
      CorpusCuration.curateWithFunnel(train, heldOut, cfg)
    assert(f.nInput >= f.nQuality)
    assert(f.nQuality >= f.nExact)
    assert(f.nExact >= f.nNearDedup)
    assert(f.nNearDedup >= f.nClean)
    assert(f.nClean >= f.nSampled)
    assert(f.nSampled > 0, s"empty corpus out of $f")
    assert(f.nChunks >= f.nSampled) // every surviving doc has ≥1 chunk

    // no near-dup pair survives inside the curated doc set
    val survivors = CorpusCuration.sampleStage(
      CorpusCuration.decontamStage(
        CorpusCuration.nearDedupStage(
          CorpusCuration.exactDedupStage(
            CorpusCuration.qualityStage(train, cfg)), cfg), heldOut, cfg), cfg)
    val leftoverPairs = Dedup.nearDupPairs(survivors, cfg.jaccardThreshold)
    // greedy drop-the-greater removes at least one side of every pair
    // found in ONE pass; a pair could only survive if dropping b exposed
    // no new pair — verify none did at this threshold
    assert(leftoverPairs.count() == 0)

    // no surviving doc is flagged against the held-out corpus
    assert(Dedup.decontaminate(survivors, heldOut, cfg.jaccardThreshold)
      .count() == 0)

    // chunks reference only surviving docs
    val orphan = chunks.join(survivors.select("doc_id"), Seq("doc_id"),
      "left_anti")
    assert(orphan.count() == 0)
  }

  test("exact near-dedup keeps exactly one doc per transitive cluster") {
    val cfg = CorpusCuration.Config()
    val base = CorpusCuration.exactDedupStage(
      CorpusCuration.qualityStage(train, cfg))
    val greedy = CorpusCuration.nearDedupStage(base, cfg)
    val exact = CorpusCuration.nearDedupStageExact(base, cfg)

    // Any greater-of-pair doc (greedy's drop set) is non-canonical in its
    // component, so exact's survivors are a subset of greedy's.
    assert(exact.join(greedy.select("doc_id"), Seq("doc_id"), "left_anti")
      .count() == 0)

    // Each transitive cluster retains exactly its canonical member.
    val comps = Graph.connectedComponents(
      Dedup.nearDupPairs(base, cfg.jaccardThreshold).select("doc_a", "doc_b"),
      "doc_a", "doc_b")
    val perCluster = comps
      .join(exact.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      .groupBy("component").agg(count(lit(1)).as("n"))
    assert(perCluster.filter(col("n") =!= 1).count() == 0)

    // And no near-dup pair survives the exact stage either.
    assert(Dedup.nearDupPairs(exact, cfg.jaccardThreshold).count() == 0)
  }

  test("c1 one-pass tail equals the staged tail bit-for-bit") {
    val cfg = CorpusCuration.Config()
    val c = CorpusCuration.decontamStage(
      CorpusCuration.nearDedupStage(
        CorpusCuration.exactDedupStage(
          CorpusCuration.qualityStage(train, cfg)), cfg), heldOut, cfg)
      .persist()
    try {
      val sm = CorpusCuration.sampleStage(c, cfg)
      val staged =
        (c.count(), sm.count(), CorpusCuration.chunkStage(sm, cfg).count())
      assert(CorpusCuration.tailCounts(c, cfg) == staged)
      assert(staged._1 > 0 && staged._3 > 0)
    } finally c.unpersist(blocking = false)
  }

  test("one-pass tail closed form holds at the n_tok = 0 edge") {
    import spark.implicits._
    // a doc whose text tokenizes to nothing must contribute 0 chunks and
    // still count in n_clean (and n_sampled if its keep-bit is true)
    val cfg = CorpusCuration.Config()
    val edge = Seq(
      (1L, "   ", "en", "s1"),      // whitespace-only: n_tok = 0
      (2L, "alpha beta", "en", "s1"),
      (700L, "gamma", "fr", "s2"))  // keep-bit varies by id/lang
      .toDF("doc_id", "text", "lang", "source")
    val sm = CorpusCuration.sampleStage(edge, cfg)
    val staged =
      (edge.count(), sm.count(), CorpusCuration.chunkStage(sm, cfg).count())
    assert(CorpusCuration.tailCounts(edge, cfg) == staged)
  }

  test("curation is deterministic across runs") {
    val a = CorpusCuration.curate(train, heldOut)
      .select(col("doc_id"), col("chunk_id")).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    val b = CorpusCuration.curate(train, heldOut)
      .select(col("doc_id"), col("chunk_id")).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }
}
