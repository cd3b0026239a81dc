package graft.cte

import graft.sources.TsvTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-pipeline comparison — the reference's own correctness oracle
  * (compare_idl_python.py): align this engine's slopes against the legacy
  * IDL pipeline's `.res` files (J8), and compute the recovered-source
  * fraction between CTE-corrected and uncorrected runs (A12).
  *
  * The reference assembles both comparisons with per-epoch query loops
  * and numpy masks; here each is one join. The IDL side arrives through
  * `TsvTables.readResFiles` (S3's `.res` dialect).
  */
object CteCompare {

  /** Our slopes keyed by observation epoch: results ⋈ chip-1 fileinfo
    * (dimension-sized broadcast). */
  private def slopesWithEpoch(resultsLong: DataFrame,
                              fileinfo: DataFrame): DataFrame = {
    val keys = fileinfo.filter(col("chip") === 1).select(
      col("targname"), col("imagename").as("imagename_1"),
      col("dateobs").as("mjd"), col("proposid"), col("filter"),
      col("exptime"), col("ctecorr"))
    resultsLong.join(broadcast(keys), Seq("targname", "imagename_1"))
  }

  /** J8: slope-by-slope alignment with the IDL pipeline on
    * (mjd, fluxbin) (compare_idl_python.py:411-502). `idlRes` is the
    * output of TsvTables.readResFiles; one row per matched slope with
    * both pipelines' values and their difference. */
  def compareWithIdl(resultsLong: DataFrame, fileinfo: DataFrame,
                     idlRes: DataFrame, aperture: Int): DataFrame = {
    val py = slopesWithEpoch(resultsLong, fileinfo)
      .filter(col("aperture") === aperture)
      .select(col("targname"), col("mjd"), col("bin_lo"), col("bin_hi"),
        col("slope").as("slope_py"),
        col("slopestdev").as("slopestdev_py"),
        col("numpoints").as("numpoints_py"))
    val idl = idlRes.select(col("mjd"), col("bin_lo"), col("bin_hi"),
      col("slope").as("slope_idl"), col("stderr").as("stderr_idl"))
    py.join(idl, Seq("mjd", "bin_lo", "bin_hi"))
      .withColumn("slope_diff", col("slope_py") - col("slope_idl"))
      .select("targname", "mjd", "bin_lo", "bin_hi",
        "slope_py", "slope_idl", "slope_diff",
        "slopestdev_py", "stderr_idl", "numpoints_py")
  }

  /** A12: percent of sources recovered by the CTE-corrected run relative
    * to the uncorrected one, per epoch and flux bin
    * (compare_idl_python.py:373-391):
    * frac = (1 − (n_ctecorr − n)/n_ctecorr)·100, x-axis log10 of the bin
    * midpoint. Pairs match across the two runs on their observation keys
    * (imagenames differ — flt vs flc — so keys, not names, join them). */
  def recoveredFraction(resultsLong: DataFrame,
                        fileinfo: DataFrame): DataFrame = {
    val joinKeys = Seq("targname", "proposid", "mjd", "filter", "exptime",
      "aperture", "bin_lo", "bin_hi")
    val s = slopesWithEpoch(resultsLong, fileinfo)
    val corr = s.filter(col("ctecorr") === 1)
      .select(joinKeys.map(col) :+ col("numpoints").as("n_ctecorr"): _*)
    val uncorr = s.filter(col("ctecorr") === 0)
      .select(joinKeys.map(col) :+ col("numpoints").as("n"): _*)
    corr.join(uncorr, joinKeys)
      .filter(col("n_ctecorr") =!= 0)
      .withColumn("frac_recovered",
        (lit(1.0) - (col("n_ctecorr") - col("n")).cast("double") /
          col("n_ctecorr").cast("double")) * 100.0)
      .withColumn("logflux_mid",
        log10((col("bin_lo").cast("double") + col("bin_hi").cast("double")) / 2.0))
      .select((joinKeys.map(col) ++ Seq(col("n_ctecorr"), col("n"),
        col("frac_recovered"), col("logflux_mid"))): _*)
  }
}
