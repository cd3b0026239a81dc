package graft.cte

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Golden checks for the 180°-test product table (cte180test_plots.py)
  * over the planted CteFixtures.{fileinfo180, phot180, results180}. */
class Cte180Spec extends SparkSpecBase {

  private lazy val fi = CteFixtures.fileinfo180(spark)
  private lazy val ph = CteFixtures.phot180(spark)
  private lazy val rs = CteFixtures.results180(spark)

  private def table(sigma: Double = 4.0) =
    CteAnalytics.cte180Table(rs, ph, fi, CteFixtures.T, "F502N",
      ctecorr = 0, aperture = 3, clipSigma = sigma)

  test("one row per planted Results row; epochs combine 55600+55620 → 55610") {
    val rows = table().orderBy("imagename_1", "fluxbin").collect()
    // The slope != [] gate (cte180test_plots.py:380): exactly the 4
    // planted Results rows survive — no fabricated (pair, bin) combos.
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Double]("epoch") == 55610.0))
    assert(rows.forall(_.getAs[Double]("exptime") == 60.0))
    // rank-join pairing: p1↔p1, p2↔p2, z1↔z1.
    assert(rows.map(r => (r.getAs[String]("imagename_1"),
      r.getAs[String]("imagename_2"))).toSet == Set(
      ("iaaa10p1q", "iaaa11p1q"), ("iaaa10p2q", "iaaa11p2q"),
      ("iaab10z1q", "iaab11z1q")))
  }

  test("4σ clip keeps the 480 outlier; chip-1 slopes invert; stderr = stdev/√n") {
    val r = table().filter(col("imagename_1") === "iaaa10p1q" &&
      col("fluxbin") === "250-500").collect().head
    // {300,320,340,480}: mean 360, σ_pop ≈ 70.7 → 4σ keeps all.
    assert(r.getAs[Double]("flux_mean") == 360.0)
    assert(math.abs(r.getAs[Double]("log10flux") - math.log10(360.0)) < 1e-12)
    // chip 1 → inverted: -(0.001/2)·2048 (cte180test_plots.py:157-158).
    assert(math.abs(r.getAs[Double]("cteslope") - (-1.024)) < 1e-12)
    // standerr = 0.004/√4 = 0.002, corrected (0.002/2)·2048 = 2.048.
    assert(math.abs(r.getAs[Double]("cteslope_stderr") - 2.048) < 1e-12)
    assert(r.getAs[Int]("chip") == 1)
  }

  test("empty-clip and empty-bin flux means are NaN; zero bins get NaN stderr") {
    val rows = table().collect()
    // single-value bin: scipy's std-0 open interval clips to empty ⇒ NaN.
    val p2 = rows.find(_.getAs[String]("imagename_1") == "iaaa10p2q").get
    assert(p2.getAs[Double]("flux_mean").isNaN)
    assert(math.abs(p2.getAs[Double]("cteslope") - (-2.048)) < 1e-12)
    // 0.006/√9 = 0.002 → 2.048 corrected.
    assert(math.abs(p2.getAs[Double]("cteslope_stderr") - 2.048) < 1e-12)
    // the 8000-32000 zero bin: no fluxes at all, 0 points ⇒ NaN stderr
    // (cte180test_plots.py:388), slope 0 survives inversion.
    val z = rows.find(_.getAs[String]("fluxbin") == "8000-32000").get
    assert(z.getAs[Double]("flux_mean").isNaN)
    assert(z.getAs[Double]("cteslope") == 0.0)
    assert(z.getAs[Double]("cteslope_stderr").isNaN)
  }

  test("chip-2 slopes are NOT inverted") {
    val r = table().filter(col("chip") === 2).collect().head
    assert(r.getAs[String]("imagename_1") == "iaab10z1q")
    assert(r.getAs[Double]("flux_mean") == 1150.0)
    assert(math.abs(r.getAs[Double]("cteslope") - 3.072) < 1e-12)
  }

  test("1.3σ variant (uvis_external_cte_plots.py:714) drops the outlier") {
    val r = table(sigma = 1.3).filter(col("imagename_1") === "iaaa10p1q" &&
      col("fluxbin") === "250-500").collect().head
    // round 1 bounds (268.08, 451.92) drop 480; {300,320,340} stable.
    assert(r.getAs[Double]("flux_mean") == 320.0)
  }
}
