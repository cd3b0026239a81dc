package graft.cte

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** TAN-projection goldens + round-trips for the WCS transform the
  * reference delegates to per-star subprocess calls
  * (run_image_extraction.py:394-409, 649-655). */
class WcsSpec extends SparkSpecBase {

  // A WFC3/UVIS-like WCS: ~0.04"/pixel scale with a slight rotation.
  private val cv1 = 6.0286; private val cv2 = -72.0815
  private val cp1 = 2048.0; private val cp2 = 1026.0
  private val c11 = -1.08e-5; private val c12 = 5.2e-6
  private val c21 = 5.1e-6; private val c22 = 1.09e-5

  test("reference pixel maps exactly to the reference sky point") {
    val (ra, dec) = Wcs.pixToSky(cp1, cp2, cv1, cv2, cp1, cp2, c11, c12, c21, c22)
    assert(math.abs(ra - cv1) < 1e-12)
    assert(math.abs(dec - cv2) < 1e-12)
  }

  test("one-pixel offset moves by the CD matrix row (small-angle golden)") {
    val (ra, dec) = Wcs.pixToSky(cp1 + 1, cp2, cv1, cv2, cp1, cp2, c11, c12, c21, c22)
    // Δdec ≈ cd21·1; Δra·cos(dec) ≈ cd11·1 (gnomonic ≈ linear at 1 px).
    assert(math.abs(dec - cv2 - c21) < 1e-9)
    assert(math.abs((ra - cv1) * math.cos(cv2.toRadians) - c11) < 1e-9)
  }

  test("pix -> sky -> pix round-trips across the full chip") {
    for (x <- Seq(0.0, 17.5, 2048.0, 4095.0); y <- Seq(0.0, 1026.0, 2051.0)) {
      val (ra, dec) = Wcs.pixToSky(x, y, cv1, cv2, cp1, cp2, c11, c12, c21, c22)
      val (bx, by) = Wcs.skyToPix(ra, dec, cv1, cv2, cp1, cp2, c11, c12, c21, c22)
      assert(math.abs(bx - x) < 1e-8, s"x: $bx vs $x")
      assert(math.abs(by - y) < 1e-8, s"y: $by vs $y")
    }
  }

  test("UDFs parallelize the transform over a DataFrame of sources") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toDouble * 4, i.toDouble * 2))
      .toDF("x", "y")
      .withColumn("crval1", lit(cv1)).withColumn("crval2", lit(cv2))
      .withColumn("crpix1", lit(cp1)).withColumn("crpix2", lit(cp2))
      .withColumn("cd1_1", lit(c11)).withColumn("cd1_2", lit(c12))
      .withColumn("cd2_1", lit(c21)).withColumn("cd2_2", lit(c22))
    val sky = df.withColumn("s",
        Wcs.pixToSkyUdf(Seq(col("x"), col("y")) ++ Wcs.params(): _*))
      .withColumn("back",
        Wcs.skyToPixUdf(Seq(col("s._1"), col("s._2")) ++ Wcs.params(): _*))
      .select(col("x"), col("y"), col("back._1").as("bx"), col("back._2").as("by"))
      .collect()
    sky.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-8)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-8)
    }
  }
}
