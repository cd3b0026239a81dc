package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._

/** Stage-level timing of the near-dup pair pipeline + its graph
  * consumers at a given SF dir — the instrument for the r10 sf10
  * investigation (d10 29×, gr5 33× at 10× data vs sf1, both fixed by
  * bucket-local verification + CSR local kernels). Diagnostic main:
  * prints per-stage wall-clock and cardinalities.
  *
  * Pass `textbook` as the second arg to ALSO time the band-bucket
  * self-join candidate build the production path replaced — at sf10 it
  * spills tens of GB (the reason it was replaced); off by default.
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1")
    val textbook = args.lift(1).contains("textbook")
    val spark = GraftSession.local()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    val base = Dedup.signatures(docs).persist()
    val nSig = t("signatures+persist")(base.count())
    println(s"[probe] signatures: $nSig")
    val banded = Dedup.bandsOf(base).persist()
    val nBand = t("bands")(banded.count())
    println(s"[probe] band rows: $nBand")
    val hot = t("hot buckets") {
      banded.groupBy("band_id", "bh").count()
        .orderBy(desc("count")).limit(5).collect().toSeq
    }
    println(s"[probe] top buckets: ${hot.mkString(" ")}")
    if (textbook) {
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().persist()
      val nCand = t("textbook candidates")(cand.count())
      println(s"[probe] candidates: $nCand")
      cand.unpersist()
    }
    val (pairs, sigBase) = Dedup.nearDupPairsWithBase(docs)
    val pairsP = pairs.persist()
    val nPairs = t("pairs full pipeline (fresh)")(pairsP.count())
    println(s"[probe] pairs: $nPairs")
    val cc = t("connectedComponents") {
      Graph.connectedComponents(pairsP, "doc_a", "doc_b")
        .groupBy("component").count().count()
    }
    println(s"[probe] components: $cc")
    val kc = t("kCorePeel") {
      Graph.kCorePeel(pairsP.select(col("doc_a").as("u"), col("doc_b").as("v")),
        "u", "v", 2, 3).collect().toSeq
    }
    println(s"[probe] kcore: ${kc.mkString(" ")}")
    sigBase.unpersist()
    spark.stop()
  }
}
