package graft.cte

import org.apache.spark.sql.DataFrame

/** Artifact-layout and report utilities — the reference's output
  * plumbing (SURVEY.md §2.1 S7/S8): the path/naming schemes as pure
  * functions and the LaTeX coefficient table emitter. PNG rendering
  * itself lives in [[PlotSink]] (JDK-only rasterization), wired through
  * [[CtePipeline.publishPlots]].
  */
object Artifacts {

  /** The flashlvl/ctecorr/timestamp directory scheme
    * (set_paths_to_outputs.py:19-80): `<outputs>/<basedir>/<pfdir>[/leaf]`
    * where pfdir = `pf<lvl>[_ctecorr]` (or the cte_vs_flashlvl variants)
    * and finalresults dirs get either a timestamp leaf or `most_recent`. */
  def outputPath(pathToOutputs: String, basedir: String, flashlvl: Int,
                 ctecorr: Boolean, mostRecent: Boolean,
                 cteVsFlashlvl: Boolean = false,
                 timestamp: String = ""): String = {
    val pfdir = (cteVsFlashlvl, ctecorr) match {
      case (false, true)  => s"pf${flashlvl}_ctecorr"
      case (false, false) => s"pf$flashlvl"
      case (true, true)   => "cte_vs_flashlvl_ctecorr"
      case (true, false)  => "cte_vs_flashlvl"
    }
    val base = s"$pathToOutputs/$basedir/$pfdir"
    if (basedir.contains("finalresults"))
      if (mostRecent) s"$base/most_recent" else s"$base/$timestamp"
    else base
  }

  /** The reference's artifact file-name scheme for slope plots/files
    * (uvis_external_cte_plots.py:126-131, 205-216). */
  def slopeArtifactName(imagename1: String, imagename2: String,
                        aperture: Int, chip: Int = 0): String = {
    val stem = s"${imagename1.split("\\.fits")(0)}_${imagename2.split("\\.fits")(0)}_r$aperture"
    if (chip == 0) s"${stem}_slopes.txt" else s"${stem}_ch${chip}_slopes.txt"
  }

  /** The PNG twin of [[slopeArtifactName]] — same stem, `.png` leaf
    * (uvis_external_cte_plots.py:289: `'{}_slopes.png'.format(outname)`). */
  def slopePlotName(imagename1: String, imagename2: String,
                    aperture: Int, chip: Int = 0): String =
    slopeArtifactName(imagename1, imagename2, aperture, chip)
      .dropRight(4) + ".png"

  /** LaTeX coefficient table (print_coeff_latextable.py:22-40): rows
    * C00..C22, one column per mode, `%0.2e` formatting. Input: the wide
    * coefficient frame (targname, c0..c8); dimension-sized by definition
    * (9 rows × modes), so the collect is the reference's own shape. */
  def coeffLatexTable(coeffs: DataFrame): String = {
    val modes = coeffs.select("targname").collect().map(_.getString(0))
    val byMode = coeffs.collect()
      .map(r => r.getString(r.fieldIndex("targname")) ->
        (0 until 9).map(k => r.getDouble(r.fieldIndex(s"c$k")))).toMap
    val labels = for (i <- 0 until 3; j <- 0 until 3) yield f"C$i$j"
    val header = ("Mode" +: modes).mkString(" & ")
    val rows = labels.zipWithIndex.map { case (lab, k) =>
      (lab +: modes.map(m => f"${byMode(m)(k)}%.2e")).mkString(" & ") + " \\\\"
    }
    (Seq("\\begin{table}", "\\begin{tabular}{" + "l" * (modes.length + 1) + "}",
      header + " \\\\", "\\hline") ++ rows ++
      Seq("\\end{tabular}", "\\end{table}")).mkString("\n")
  }
}
