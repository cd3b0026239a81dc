package graft

import org.apache.spark.sql.functions._

/** KMV distinct sketch (operators.Sketch) and the exact-moment statistics
  * family (a17): both derive their value from sufficient state that is
  * commutative/mergeable — these specs pin the statistical contracts the
  * oracle hash can't express (error bounds, agreement with the built-in
  * estimators they replace).
  */
class SketchSpec extends SparkSpecBase {

  test("KMV estimate lands within the theoretical error bound at 10k keys") {
    import spark.implicits._
    // 10_000 known-distinct keys through the SAME estimator pipeline as
    // k1: h = first 15 hex md5 digits; est = (k-1)*2^60 / kth-min.
    val k = 32
    val n = 10000
    val dh = (1 to n).map(_.toString).toDF("key")
      .withColumn("h",
        conv(substring(md5(col("key")), 1, 15), 16, 10).cast("long"))
      .select("h").distinct()
    val kth = plans.GroupedTopK.topK(
        dh.withColumn("g", lit(1)), Seq("g"), k, col("h").asc)
      .agg(max(col("h")).as("hk")).collect()(0).getLong(0)
    val est = (k - 1).toDouble * 1152921504606846976.0 / kth.toDouble
    // standard KMV relative error ≈ 1/√(k−2) ≈ 18%; allow 3σ.
    val relErr = math.abs(est - n) / n
    assert(relErr < 3.0 / math.sqrt(k - 2.0), s"est=$est relErr=$relErr")
  }

  test("KMV is exact below sketch capacity") {
    val (s, dir) = (spark, sfDir)
    val out = SparkEntry.queries("k1_kmv_distinct")(s, dir).collect()
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("est_distinct")
      if (exact < 32) assert(est == exact.toDouble,
        s"${r.getAs[String]("event_type")}: est $est != exact $exact below capacity")
    }
  }

  test("CMS estimates never underestimate (one-sided bias)") {
    val out = SparkEntry.queries("k2_cms_heavy")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (t, e) = (r.getAs[Long]("n_true"), r.getAs[Long]("est"))
      assert(e >= t, s"user ${r.get(0)}: est $e < true $t — CMS can't under-count")
    }
  }

  test("a17 exact-moment correlation agrees with Spark's built-in corr") {
    val out = SparkEntry.queries("a17_exact_corr")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("corr_qty_price")).toMap
    val builtin = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("c")).toMap
    assert(out.keySet == builtin.keySet)
    out.foreach { case (g, v) =>
      assert(math.abs(v - builtin(g)) < 1e-9, s"$g: $v vs ${builtin(g)}")
    }
  }
}
