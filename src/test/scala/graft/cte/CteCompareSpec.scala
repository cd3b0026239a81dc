package graft.cte

import graft.SparkSpecBase
import graft.sources.TsvTables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CteCompareSpec extends SparkSpecBase {

  import spark.implicits._

  private def fi(img: String, ctecorr: Int) =
    ("ngc104", img, 55106.0, "12379", "F502N", 348.0, ctecorr, 1)

  private lazy val fileinfo = Seq(fi("i1_flt", 0), fi("i1_flc", 1))
    .toDF("targname", "imagename", "dateobs", "proposid", "filter",
      "exptime", "ctecorr", "chip")

  private def res(img: String, lo: Int, hi: Int, slope: Double, n: Int) =
    ("ngc104", img, "x2", 3, lo, hi, slope, 0.01, n)

  private lazy val results = Seq(
    res("i1_flt", 250, 500, -2.1e-4, 8), res("i1_flt", 500, 2000, -1.4e-4, 10),
    res("i1_flc", 250, 500, -0.6e-4, 10), res("i1_flc", 500, 2000, -0.2e-4, 10))
    .toDF("targname", "imagename_1", "imagename_2", "aperture",
      "bin_lo", "bin_hi", "slope", "slopestdev", "numpoints")

  test("compareWithIdl aligns on (mjd, fluxbin) and reports the delta") {
    val dir = Files.createTempDirectory("graft_cmp")
    Files.writeString(dir.resolve("n104_F502N_l_r3_250_500.res"),
      "55106.0 x x x -0.0002 0.00003\n55466.0 x x x -0.0004 0.00004\n")
    val idl = TsvTables.readResFiles(spark, dir.toString + "/*.res")
    val cmp = CteCompare.compareWithIdl(
      results.filter(col("imagename_1") === "i1_flt"), fileinfo, idl,
      aperture = 3).collect()
    // only (55106, 250-500) exists on both sides; 55466 has no python row
    assert(cmp.length == 1)
    val r = cmp(0)
    assert(r.getAs[Double]("mjd") == 55106.0)
    assert(r.getAs[Double]("slope_idl") == -0.0002)
    assert(math.abs(r.getAs[Double]("slope_diff") - (-2.1e-4 + 2.0e-4)) < 1e-12)
    assert(r.getAs[Int]("numpoints_py") == 8)
  }

  test("recoveredFraction matches flt/flc pairs on keys, not imagenames") {
    val got = CteCompare.recoveredFraction(results, fileinfo)
      .orderBy("bin_lo").collect()
    assert(got.length == 2)
    // bin 250-500: corr n=10, uncorr n=8 → (1 − 2/10)·100 = 80
    assert(math.abs(got(0).getAs[Double]("frac_recovered") - 80.0) < 1e-12)
    assert(math.abs(got(0).getAs[Double]("logflux_mid") -
      math.log10(375.0)) < 1e-12)
    // bin 500-2000: 10/10 → 100
    assert(math.abs(got(1).getAs[Double]("frac_recovered") - 100.0) < 1e-12)
  }
}
