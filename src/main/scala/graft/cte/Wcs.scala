package graft.cte

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Tangent-plane (TAN) pixel↔sky world-coordinate transform.
  *
  * The reference shells out to drizzlepac's `pixtosky`/`skytopix` once per
  * source in a Python loop and flags it "very, very slow. Parallelize?"
  * (run_image_extraction.py:394-409, 649-655). The transform itself is the
  * standard FITS gnomonic projection (WCS Papers I/II): 8 header values —
  * reference point (crval1, crval2), reference pixel (crpix1, crpix2) and
  * the CD matrix (cd1_1, cd1_2, cd2_1, cd2_2) — define it completely, so
  * it is embarrassingly parallel as a per-row expression: what took the
  * reference a subprocess per star is a codegen-adjacent UDF evaluated
  * inside the scan here.
  *
  * Conventions: pixel coordinates are 0-based (matching the reference's
  * `xy2rd(x=0, y=0)` corner calls); angles in degrees.
  */
object Wcs {

  private val D2R = math.Pi / 180.0
  private val R2D = 180.0 / math.Pi

  /** Pixel → (ra, dec) in degrees, gnomonic (TAN) projection. */
  def pixToSky(x: Double, y: Double,
               crval1: Double, crval2: Double,
               crpix1: Double, crpix2: Double,
               cd11: Double, cd12: Double,
               cd21: Double, cd22: Double): (Double, Double) = {
    val u = x - crpix1
    val v = y - crpix2
    val xi = (cd11 * u + cd12 * v) * D2R // intermediate world coords, rad
    val eta = (cd21 * u + cd22 * v) * D2R
    val ra0 = crval1 * D2R
    val dec0 = crval2 * D2R
    val den = math.cos(dec0) - eta * math.sin(dec0)
    val ra = ra0 + math.atan2(xi, den)
    val dec = math.atan2(
      math.sin(dec0) + eta * math.cos(dec0),
      math.sqrt(xi * xi + den * den))
    // normalize RA into [0, 360)
    val raDeg = {
      val r = ra * R2D % 360.0
      if (r < 0) r + 360.0 else r
    }
    (raDeg, dec * R2D)
  }

  /** (ra, dec) degrees → pixel, inverse gnomonic projection. */
  def skyToPix(ra: Double, dec: Double,
               crval1: Double, crval2: Double,
               crpix1: Double, crpix2: Double,
               cd11: Double, cd12: Double,
               cd21: Double, cd22: Double): (Double, Double) = {
    val ra0 = crval1 * D2R
    val dec0 = crval2 * D2R
    val dra = ra * D2R - ra0
    val sd = math.sin(dec * D2R); val cdec = math.cos(dec * D2R)
    val sd0 = math.sin(dec0); val cd0 = math.cos(dec0)
    val den = sd * sd0 + cdec * cd0 * math.cos(dra)
    val xi = cdec * math.sin(dra) / den * R2D
    val eta = (sd * cd0 - cdec * sd0 * math.cos(dra)) / den * R2D
    // invert the CD matrix
    val det = cd11 * cd22 - cd12 * cd21
    val u = (cd22 * xi - cd12 * eta) / det
    val v = (cd11 * eta - cd21 * xi) / det
    (u + crpix1, v + crpix2)
  }

  /** UDF: (x, y, crval1, crval2, crpix1, crpix2, cd11, cd12, cd21, cd22)
    * → named struct (ra, dec). */
  val pixToSkyUdf: UserDefinedFunction = udf(
    (x: Double, y: Double, cv1: Double, cv2: Double, cp1: Double,
     cp2: Double, c11: Double, c12: Double, c21: Double, c22: Double) => {
      pixToSky(x, y, cv1, cv2, cp1, cp2, c11, c12, c21, c22)
    })

  /** UDF: (ra, dec, …wcs) → named struct (x, y). */
  val skyToPixUdf: UserDefinedFunction = udf(
    (ra: Double, dec: Double, cv1: Double, cv2: Double, cp1: Double,
     cp2: Double, c11: Double, c12: Double, c21: Double, c22: Double) => {
      skyToPix(ra, dec, cv1, cv2, cp1, cp2, c11, c12, c21, c22)
    })

  /** The 8 WCS parameter columns in canonical order, for call sites. */
  def params(prefix: String = ""): Seq[Column] =
    Seq("crval1", "crval2", "crpix1", "crpix2",
        "cd1_1", "cd1_2", "cd2_1", "cd2_2").map(n => col(prefix + n))
}
