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

  test("bottom-k sample merges like KMV: partition-wise bottom-k re-merged == global") {
    // the property that lets k3 ship ≤k rows per group from every
    // executor: bottom-k by a shared hash is associative — take bottom-k
    // of each half, union, take bottom-k again, get the global bottom-k
    val k = 256
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .withColumn("h",
        conv(substring(md5(concat_ws(":",
          col("l_orderkey"), col("l_linenumber"))), 1, 15), 16, 10)
          .cast("long"))
    // the natural key is non-unique in this corpus, so the ordering runs
    // through the value column (same total order as k3 itself)
    def bottomK(df: org.apache.spark.sql.DataFrame) =
      plans.GroupedTopK.topK(df, Seq("l_returnflag"), k,
        col("h").asc, col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_extendedprice").asc)
    val global = bottomK(li)
    val merged = bottomK(
      bottomK(li.filter(pmod(col("l_orderkey"), lit(2)) === 0))
        .unionByName(bottomK(li.filter(pmod(col("l_orderkey"), lit(2)) === 1))))
    // multiset comparison: duplicate-key rows are legitimate sample members
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .sortBy(_.toString).toSeq
    val (g, m) = (rows(global), rows(merged))
    assert(g == m, s"partition-wise merge diverged from the global bottom-k")
    // sample is full-capacity k, or the whole group when it's smaller
    val groupN = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    g.groupBy(_._1).foreach { case (flag, rs) =>
      assert(rs.size == math.min(k.toLong, groupN(flag)),
        s"$flag: sample ${rs.size} != min($k, ${groupN(flag)})")
    }
  }

  test("k3 sample quantiles land within the 3-sigma rank bound of truth") {
    // value-space error depends on the distribution; RANK-space error of
    // a uniform-sample quantile is binomial: |F(est) − p| ≲ 3·√(p(1−p)/k)
    val out = SparkEntry.queries("k3_bottomk_quantiles")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    for (r <- out; (tag, p) <- Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)) {
      val flag = r.getAs[String]("l_returnflag")
      val est = r.getAs[Double](s"est_$tag")
      val vals = li(flag)
      val cdf = vals.count(_ <= est).toDouble / vals.length
      val bound = 3.0 * math.sqrt(p * (1 - p) / 256.0) + 1.0 / vals.length
      assert(math.abs(cdf - p) <= bound,
        s"$flag $tag: est=$est F(est)=$cdf p=$p bound=$bound")
    }
  }

  test("k4 set algebra: estimates track exact union/intersection, exact below capacity") {
    val rows = SparkEntry.queries("k4_kmv_set_algebra")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nu, ni) = (r.getAs[Long]("n_union_exact"), r.getAs[Long]("n_inter_exact"))
      val (eu, ei) = (r.getAs[Double]("est_union"), r.getAs[Double]("est_inter"))
      // intersection can never estimate above the union; both non-negative
      assert(ei >= 0.0 && ei <= eu + 1e-9, s"est_inter out of range: $r")
      // K=32 → relative SD ≈ 1/sqrt(30) ≈ 18%; allow a generous 4-sigma
      // band so the spec pins gross estimator breakage, not luck
      assert(eu > nu * 0.28 && eu < nu * 3.6,
        s"union estimate implausible: est=$eu exact=$nu")
      // below sketch capacity the merged sketch IS the union: exact
      if (nu < 32) assert(eu == nu.toDouble, s"sub-capacity union not exact: $r")
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
