package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic for d9's sf10 cost attribution (r12). Constants
  * reference Dedup's own (ADVICE r12): the diagnostic measures the
  * PRODUCTION banding/kernel parameters, not a drifting copy. */
object D9Diag {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val docs = graft.Tables.documents(spark, dir)
    val reps = docs.groupBy(md5(substring(col("text"), 1, 120)).as("_h"))
      .agg(min(col("doc_id")).as("doc_id")).drop("_h")
    val base = docs.join(reps, Seq("doc_id"))
      .select(col("doc_id"),
        substring(col("text"), 1, graft.operators.Dedup.d9Prefix).as("pfx"),
        graft.functions.TextKernels.charMinhashSigsUdf(
          graft.operators.Dedup.bandK)(col("text")).as("csig"))
      .filter(length(col("pfx")) >= graft.operators.Dedup.bandK).persist()
    println("base=" + base.count())
    val P = graft.functions.TextPrims.P
    val bandCols = (0 until graft.operators.Dedup.nBands).map { i =>
      expr(s"struct(CAST($i AS INT) AS band_id, " +
        s"(element_at(csig, ${2 * i + 1})*131 + element_at(csig, ${2 * i + 2})) % $P AS bh)")
    }
    val banded = base.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"), col("band.bh").as("bh"))
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val members = base.select(col("doc_id"), col("pfx").as("hs"))
    val grouped = graft.operators.Dedup.groupedOneSidedDiag(banded, members,
      graft.operators.Dedup.bucketChunkSize)
      .persist()
    t("group") {
      val st = grouped.select(
        count(lit(1)).as("rows"),
        sum(size(col("amem")) * coalesce(size(col("bmem")), lit(0))).as("cross"),
        sum(when(coalesce(size(col("bmem")), lit(0)) === 0,
          size(col("amem")) * (size(col("amem")) - 1) / 2)).as("intra"),
        max(size(col("amem")) + coalesce(size(col("bmem")), lit(0))).as("fattest"))
        .head()
      println("rows=" + st.get(0) + " crossPairs=" + st.get(1) +
        " intraPairs=" + st.get(2) + " fattest=" + st.get(3))
    }
    t("kernel") {
      val n = grouped.select(explode(
        graft.functions.TextKernels.chunkPairEditsUdf(
          col("amem"), col("bmem"), lit(graft.operators.Dedup.d9Prefix / 2),
          lit(graft.operators.Dedup.bucketChunkSize * 8))).as("p")).count()
      println("survivors(with dup)=" + n)
    }
    spark.stop()
  }
}
