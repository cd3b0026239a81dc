package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the LLM-data-pipeline operators
  * composed the way a real pretraining prep job runs them —
  *
  *   quality filter → exact dedup → MinHash near-dedup →
  *   decontaminate vs held-out → stratified sample → chunk
  *
  * Each stage is one of the oracle-checked operators (t2/t5 signals, d1,
  * d4 via [[Dedup.nearDupPairs]], d7 via [[Dedup.decontaminate]], d8,
  * t6 via [[TextAnalysis.chunked]]); this object only sequences them, so
  * the composition inherits their scale properties: the only shuffles in
  * the whole pipeline are the dedup groupBy, the two band joins, and the
  * near-dup anti-joins — everything else is narrow.
  *
  * Near-dedup canonicalization offers two rules:
  *   - [[nearDedupStage]] (default): the standard greedy rule — drop a
  *     doc if it appears as the GREATER id of any matched pair. One
  *     anti-join; differs from the exact rule only on chains A~B~C
  *     where A≁C, which MinHash at a sane threshold makes rare.
  *   - [[nearDedupStageExact]]: connected components over the pair
  *     graph ([[Graph.connectedComponents]], d10) — keeps exactly one
  *     doc per TRANSITIVE duplicate cluster, at the cost of the
  *     iterative label-propagation joins. Still no driver-side
  *     union-find.
  */
object CorpusCuration {

  /** Eagerly-counted funnel, one count per stage (each is an action —
    * call on samples/tests, not inside a production job). */
  case class Funnel(nInput: Long, nQuality: Long, nExact: Long,
                    nNearDedup: Long, nClean: Long, nSampled: Long,
                    nChunks: Long)

  case class Config(
      minQuality: Double = 0.25,
      maxRepetition: Double = 0.9,
      jaccardThreshold: String = "0.08",
      sampleRates: Map[String, Int] = Map("en" -> 90), // percent kept
      defaultRate: Int = 100,
      chunkSize: Int = 50,
      chunkStride: Int = 40)

  /** The curated chunk table (doc_id, chunk_id, chunk, lang, source). */
  def curate(docs: DataFrame, heldOut: DataFrame,
             cfg: Config = Config()): DataFrame =
    chunkStage(sampleStage(cleanStage(docs, heldOut, cfg), cfg), cfg)

  /** curate() plus the per-stage row funnel (runs counting actions). */
  def curateWithFunnel(docs: DataFrame, heldOut: DataFrame,
                       cfg: Config = Config()): (DataFrame, Funnel) = {
    val q = qualityStage(docs, cfg)
    val e = exactDedupStage(q)
    val n = nearDedupStage(e, cfg)
    val c = decontamStage(n, heldOut, cfg)
    val s = sampleStage(c, cfg)
    val ch = chunkStage(s, cfg)
    (ch, Funnel(docs.count(), q.count(), e.count(), n.count(), c.count(),
      s.count(), ch.count()))
  }

  private def cleanStage(docs: DataFrame, heldOut: DataFrame,
                         cfg: Config): DataFrame =
    decontamStage(
      nearDedupStage(exactDedupStage(qualityStage(docs, cfg)), cfg),
      heldOut, cfg)

  /** t2/t5 signals as a filter: keep scoring docs that aren't boilerplate. */
  def qualityStage(docs: DataFrame, cfg: Config): DataFrame =
    TextAnalysis.withQualitySignals(docs)
      .filter(col("n_tok") > 0 &&
        col("quality_score") >= cfg.minQuality &&
        col("rep_ratio") <= cfg.maxRepetition)
      .select(docs.columns.map(col): _*)

  /** d1 as a filter: keep the smallest doc_id per exact text. */
  def exactDedupStage(docs: DataFrame): DataFrame = {
    val canon = docs.groupBy(col("text").as("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(canon, Seq("doc_id"), "left_semi")
  }

  /** d4 as a filter: drop the greater id of every near-dup pair. */
  def nearDedupStage(docs: DataFrame, cfg: Config): DataFrame = {
    val losers = Dedup.nearDupPairs(docs, cfg.jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** d10 as a filter: keep the smallest doc_id of every transitive
    * near-dup cluster — exact on the chains the greedy rule misjudges.
    * Non-canonical cluster members (id ≠ component label) are the drop
    * set; docs in no pair are untouched. */
  def nearDedupStageExact(docs: DataFrame, cfg: Config): DataFrame = {
    val pairs = Dedup.nearDupPairs(docs, cfg.jaccardThreshold)
      .select("doc_a", "doc_b")
    val losers = Graph.connectedComponents(pairs, "doc_a", "doc_b")
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** d7 as a filter: drop docs matching the held-out corpus. */
  def decontamStage(docs: DataFrame, heldOut: DataFrame,
                    cfg: Config): DataFrame = {
    val flagged = Dedup.decontaminate(docs, heldOut, cfg.jaccardThreshold)
      .select(col("train_doc").as("doc_id"))
    docs.join(flagged, Seq("doc_id"), "left_anti")
  }

  /** d8: deterministic per-stratum downsample (scan filter, no shuffle). */
  def sampleStage(docs: DataFrame, cfg: Config): DataFrame = {
    val u = (col("doc_id") * lit(2654435761L)) % lit(1000003L) % lit(100L)
    val rate = cfg.sampleRates.foldLeft(lit(cfg.defaultRate)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    docs.filter(u < rate)
  }

  /** t6: the surviving docs as overlapping token-window chunks. */
  def chunkStage(docs: DataFrame, cfg: Config): DataFrame =
    TextAnalysis.chunked(docs, cfg.chunkSize, cfg.chunkStride)
      .select("doc_id", "chunk_id", "chunk", "lang", "source")
}
