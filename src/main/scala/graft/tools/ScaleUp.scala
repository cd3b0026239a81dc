package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of a driver-generated SF directory — the
  * SCALE-HEADROOM instrument (VERDICT r8 "what's missing" #3): every
  * correctness record lives at sf ≤ 0.1, so nothing measured backs the
  * 100 TB design narratives. This main materializes factor× the base
  * corpus by unioning key-shifted replicas, preserving the schema, the
  * per-key fan-outs, and referential integrity (each replica's foreign
  * keys shift by the same per-table stride), so per-query wall-clock can
  * be compared across SFs on identical plan shapes.
  *
  * NOT a correctness surface: replica r of a document gets a one-token
  * tag appended so the near-dup structure stays corpus-like instead of
  * every doc acquiring factor−1 exact clones; embeddings are copied
  * verbatim (ANN perf does not care about tie-breaks). region/nation are
  * fixed-size dimensions and are copied once, unshifted.
  *
  * `clusterSize` caps the near-dup CLUSTER size. With the default
  * (= factor) every replica of a base doc is a near-dup of every other —
  * fine at 10×, but at 100× that grows dup cliques WITH the corpus,
  * which no crawl does (a 100× bigger crawl has ~100× more boilerplate
  * clusters of similar size, not the same clusters 100× fatter) and
  * makes pair-based operators quadratic in the FACTOR rather than the
  * data: the factor-100 compounded corpus spilled >75 GB verifying
  * 100-clique candidate pairs. With clusterSize = c, replicas split into
  * factor/c groups; each group's text is token-transformed (every token
  * prefixed with a group tag, so cross-group 13-gram Jaccard ≈ 0) and
  * carries c near-dup members — cluster COUNT scales, cluster size
  * stays crawl-like.
  *
  * Usage: runMain graft.tools.ScaleUp <baseDir> <outDir> <factor>
  *          [clusterSize]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val clusterSize = args.lift(3).map(_.toInt).getOrElse(factor)
    val spark = GraftSession.local()
    ScaleUpCore.run(spark, base, out, factor, clusterSize)
    spark.stop()
  }
}

/** The generator body, separated from the session-owning main so
  * ScaleUpSpec can drive it inside the shared test session. */
object ScaleUpCore {

  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  def run(spark: SparkSession, base: String, out: String,
          factor: Int, clusterSize: Int = Int.MaxValue): Unit = {
    def rd(t: String) = spark.read.parquet(s"$base/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // fixed-size dimensions: copy once
    Seq("region", "nation").foreach(t => wr(rd(t), t))

    val custS = stride(rd("customer"), "c_custkey")
    val suppS = stride(rd("supplier"), "s_suppkey")
    val partS = stride(rd("part"), "p_partkey")
    val ordS = stride(rd("orders"), "o_orderkey")

    /** factor copies of `df`, each with the listed key columns shifted by
      * r·stride — one narrow union, no shuffle. */
    def rep(df: DataFrame, shifts: (String, Long)*): DataFrame =
      (0 until factor).map { r =>
        shifts.foldLeft(df) { case (d, (k, s)) =>
          d.withColumn(k, col(k) + lit(r * s))
        }
      }.reduce(_ unionByName _)

    wr(rep(rd("customer"), "c_custkey" -> custS), "customer")
    wr(rep(rd("supplier"), "s_suppkey" -> suppS), "supplier")
    wr(rep(rd("part"), "p_partkey" -> partS), "part")
    wr(rep(rd("orders"), "o_orderkey" -> ordS, "o_custkey" -> custS),
      "orders")
    wr(rep(rd("lineitem"), "l_orderkey" -> ordS, "l_suppkey" -> suppS,
      "l_partkey" -> partS), "lineitem")

    val ev = rd("events")
    val userS = stride(ev, "user_id")
    val evS = stride(ev, "event_id")
    wr(rep(ev, "user_id" -> userS, "event_id" -> evS), "events")

    val docs = rd("documents")
    val docS = stride(docs, "doc_id")
    val docReps = (0 until factor).map { r =>
      val g = r / clusterSize // near-dup group; 0 = untransformed base
      val grouped = if (g == 0) docs
        // Prefix every token with a group tag: all 13-gram shingles
        // change, so cross-group Jaccard ≈ 0 and the group's members
        // form their own crawl-sized near-dup cluster. Token count and
        // document shape are preserved (quality/lang signals stay sane).
        else docs.withColumn("text",
          regexp_replace(col("text"), "(^|\\s)(\\S)", s"$$1g${g}x$$2"))
      grouped.withColumn("doc_id", col("doc_id") + lit(r * docS))
        // perturb: replicas are near- but not exact dups of each other
        .withColumn("text", concat(col("text"), lit(s" replica${r % clusterSize}")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
    wr(docReps, "documents")

    val emb = rd("embeddings")
    val vecS = stride(emb, "vec_id")
    wr(rep(emb, "vec_id" -> vecS), "embeddings")

    println(s"[scaleup] wrote ${factor}x $base -> $out")
  }
}
