package graft

import graft.operators.Skew
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the salted-vs-plain skew question
  * (round-5 verdict item 8): a 99:1 hot key over lineitem at the given
  * SF, alternating reps of
  *
  *   agg:  plain groupBy(count,sum)      vs Skew.saltedSumCount
  *   join: plain inner join (forced SMJ) vs Skew.saltedJoin
  *
  * The join probes run with autoBroadcastJoinThreshold=-1 — salting
  * exists for the regime where the dimension side does NOT broadcast;
  * with broadcast on, Spark never shuffles the big side and there is
  * nothing to salt. Alternation means run-to-run drift hits both forms
  * equally. Not part of the library surface.
  */
object SkewProbe {

  private def skewed(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      when(pmod(col("l_orderkey"), lit(100)) < 99, lit("hot"))
        .otherwise(concat(lit("k"),
          pmod(col("l_orderkey"), lit(7)).cast("string"))).as("k"),
      col("l_quantity").cast("long").as("v"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local()

    def dim(s: SparkSession) = skewed(s, dir).select("k").distinct()
      .withColumn("payload", length(col("k")).cast("long"))

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def aggPlain(): Unit = sink(
      skewed(spark, dir).groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v")))
    def aggSalted(): Unit = sink(
      Skew.saltedSumCount(skewed(spark, dir), Seq("k"), "v", 32))
    def joinPlain(): Unit = sink(
      skewed(spark, dir).join(dim(spark), Seq("k")))
    def joinSalted(): Unit = sink(
      Skew.saltedJoin(skewed(spark, dir), dim(spark), Seq("k"), 32))

    def measure(label: String, a: () => Unit, b: () => Unit): Unit = {
      a(); b() // warm both plan shapes
      val (ta, tb) = (Array.newBuilder[Double], Array.newBuilder[Double])
      for (_ <- 1 to reps) {
        var t0 = System.nanoTime(); a(); ta += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); b(); tb += (System.nanoTime() - t0) / 1e9
      }
      def st(x: Array[Double]) =
        f"min=${x.min}%.2f med=${x.sorted.apply(x.length / 2)}%.2f " +
          f"mean=${x.sum / x.length}%.2f [${x.map(v => f"$v%.2f").mkString(", ")}]"
      println(s"[skewprobe] $label plain:  ${st(ta.result())}")
      println(s"[skewprobe] $label salted: ${st(tb.result())}")
    }

    measure("agg ", () => aggPlain(), () => aggSalted())

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try measure("join", () => joinPlain(), () => joinSalted())
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    spark.stop()
  }
}
