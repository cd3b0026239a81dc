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
  * Usage: runMain graft.tools.ScaleUp <baseDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local()
    ScaleUpCore.run(spark, base, out, factor)
    spark.stop()
  }
}

/** The generator body, separated from the session-owning main so
  * ScaleUpSpec can drive it inside the shared test session. */
object ScaleUpCore {

  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  def run(spark: SparkSession, base: String, out: String,
          factor: Int): Unit = {
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
      docs.withColumn("doc_id", col("doc_id") + lit(r * docS))
        // perturb: replicas are near- but not exact dups of each other
        .withColumn("text", concat(col("text"), lit(s" replica$r")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
    wr(docReps, "documents")

    val emb = rd("embeddings")
    val vecS = stride(emb, "vec_id")
    wr(rep(emb, "vec_id" -> vecS), "embeddings")

    println(s"[scaleup] wrote ${factor}x $base -> $out")
  }
}
