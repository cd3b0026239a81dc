package graft

/** Pins the cumulative-count rank selection (one hash aggregate over
  * (group, value), cumulative pass over DISTINCT values) to the
  * row_number window formulation it replaced in w8, dq2 and k3's truth
  * side. The rewrite exists because the window plans sorted the whole
  * fact table into #group partitions (a2's low-cardinality hazard,
  * measured 274 s vs 21 s at sf10); every selected statistic is a
  * VALUE, so tie-breaks cannot move it and the outputs must be
  * bit-identical. */
class RankSelectSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("w8 cum-dist percentiles == window plan, bit-exact") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val a = rows(graft.operators.WindowedScalar.w8ByCumDist(spark, dir))
      val b = rows(graft.operators.WindowedScalar.w8ByWindow(spark, dir))
      assert(a == b, s"w8 plans diverge at $dir")
      assert(a.nonEmpty)
    }
  }

  test("dq2 cum-dist median/MAD == window plan, bit-exact") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val a = rows(graft.operators.WindowedScalar.dq2ByCumDist(spark, dir))
      val b = rows(graft.operators.WindowedScalar.dq2ByWindow(spark, dir))
      assert(a == b, s"dq2 plans diverge at $dir")
      assert(a.nonEmpty)
    }
  }

  test("k3 cum-dist discrete quantiles == window plan, bit-exact") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val a = rows(graft.operators.Sketch.k3Plan(spark, dir, windowSel = false))
      val b = rows(graft.operators.Sketch.k3Plan(spark, dir, windowSel = true))
      assert(a == b, s"k3 plans diverge at $dir")
      assert(a.nonEmpty)
    }
  }
}
