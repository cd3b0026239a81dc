package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway measurement harness for the a2 sigma-clip formulation
  * question (round-5 verdict item 2): window stats (one exchange+sort,
  * linear plan) vs aggregate+broadcast-join+persist (no fact shuffle,
  * but re-reads input per pass). Alternates the two ≥5 times each so
  * run-to-run drift hits both equally. Not part of the library surface.
  */
object A2Probe {
  private def clipInput(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_returnflag"), col("l_linestatus"),
      col("l_extendedprice").cast(DecimalType(18, 2)).as("vdec"),
      col("l_extendedprice").cast(DecimalType(18, 2)).cast("double").as("vd"))

  private def clipPassJoin(df: DataFrame, groups: Seq[String], k: Double): DataFrame = {
    val stats = df.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(col("vdec")).as("_s"),
        sum((col("vdec") * col("vdec")).cast(DecimalType(38, 4))).as("_ss"))
      .withColumn("_mean", col("_s").cast("double") / col("_n").cast("double"))
      .withColumn("_std",
        sqrt(col("_ss").cast("string").cast("double") / col("_n").cast("double") -
             col("_mean") * col("_mean")))
    df.join(broadcast(stats), groups)
      .filter(col("vd") >= col("_mean") - lit(k) * col("_std") &&
              col("vd") <= col("_mean") + lit(k) * col("_std"))
      .drop("_n", "_s", "_ss", "_mean", "_std")
  }

  private def clipPassW(df: DataFrame, groups: Seq[String], k: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groups.map(col): _*)
    val mean = sum(col("vdec")).over(w).cast("double") /
      count(lit(1)).over(w).cast("double")
    val std = sqrt(
      sum((col("vdec") * col("vdec")).cast(DecimalType(38, 4))).over(w)
        .cast("string").cast("double") /
        count(lit(1)).over(w).cast("double") - mean * mean)
    df.withColumn("_mean", mean).withColumn("_std", std)
      .filter(col("vd") >= col("_mean") - lit(k) * col("_std") &&
              col("vd") <= col("_mean") + lit(k) * col("_std"))
      .drop("_mean", "_std")
  }

  private def finish(df: DataFrame, groups: Seq[String]): DataFrame =
    df.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), sum(col("vdec")).as("_s"),
        sum((col("vdec") * col("vdec")).cast(DecimalType(38, 4))).as("_ss"))
      .withColumn("clip_mean", col("_s").cast("double") / col("n_kept").cast("double"))
      .withColumn("clip_std",
        sqrt(col("_ss").cast("string").cast("double") / col("n_kept").cast("double") -
             col("clip_mean") * col("clip_mean")))
      .drop("_s", "_ss")
      .orderBy(groups.head, groups.tail: _*)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.local()
    val groups = Seq("l_returnflag", "l_linestatus")

    def runWindow(): Unit = {
      var df = clipInput(spark, dir)
      for (_ <- 1 to 3) df = clipPassW(df, groups, 4.0)
      finish(df, groups).write.format("noop").mode("overwrite").save()
    }
    def runJoin(): Unit = {
      var df = clipInput(spark, dir)
      for (_ <- 1 to 3) df = clipPassJoin(df, groups, 4.0).persist()
      finish(df, groups).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }

    // warm both plan shapes
    runWindow(); runJoin(); spark.catalog.clearCache()

    val (wT, jT) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to reps) {
      var t0 = System.nanoTime(); runWindow(); wT += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime(); runJoin(); jT += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
    }
    val w = wT.result(); val j = jT.result()
    def stats(a: Array[Double]) =
      f"min=${a.min}%.2f med=${a.sorted.apply(a.length / 2)}%.2f mean=${a.sum / a.length}%.2f max=${a.max}%.2f [${a.map(x => f"$x%.2f").mkString(", ")}]"
    println(s"[a2probe] window: ${stats(w)}")
    println(s"[a2probe] join:   ${stats(j)}")
    spark.stop()
  }
}
