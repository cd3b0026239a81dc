package graft.cte

import graft.SparkSpecBase

class ArtifactsSpec extends SparkSpecBase {

  test("output path scheme matches set_paths_to_outputs semantics") {
    assert(Artifacts.outputPath("/o", "plots", 12, ctecorr = false,
      mostRecent = false) == "/o/plots/pf12")
    assert(Artifacts.outputPath("/o", "plots", 12, ctecorr = true,
      mostRecent = false) == "/o/plots/pf12_ctecorr")
    assert(Artifacts.outputPath("/o", "finalresults", 0, ctecorr = false,
      mostRecent = true) == "/o/finalresults/pf0/most_recent")
    assert(Artifacts.outputPath("/o", "finalresults", 0, ctecorr = true,
      mostRecent = false, timestamp = "2026.08.12.1") ==
      "/o/finalresults/pf0_ctecorr/2026.08.12.1")
    assert(Artifacts.outputPath("/o", "plots", 6, ctecorr = true,
      mostRecent = false, cteVsFlashlvl = true) ==
      "/o/plots/cte_vs_flashlvl_ctecorr")
  }

  test("slope artifact naming, nominal and 180-degree") {
    assert(Artifacts.slopeArtifactName("ia1_flt.fits", "ia2_flt.fits", 3) ==
      "ia1_flt_ia2_flt_r3_slopes.txt")
    assert(Artifacts.slopeArtifactName("ia1_flt.fits", "ia2_flt.fits", 3,
      chip = 1) == "ia1_flt_ia2_flt_r3_ch1_slopes.txt")
  }

  test("LaTeX coefficient table: C-row order and %0.2e formatting") {
    import spark.implicits._
    val coeffs = Seq(
      ("modeA", 0.2, -0.1, 0.05, 0.01, -0.02, 0.0, 1.0e-4, 0.0, -1.0e-5))
      .toDF("targname", "c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8")
    val tex = Artifacts.coeffLatexTable(coeffs)
    val lines = tex.split("\n")
    assert(lines.head == "\\begin{table}")
    assert(lines.contains("Mode & modeA \\\\"))
    assert(lines.exists(_.startsWith("C00 & 2.00e-01")))
    assert(lines.exists(_.startsWith("C12 & 0.00e+00")))  // k=5 → row 1 col 2
    assert(lines.exists(_.startsWith("C22 & -1.00e-05")))
    assert(lines.last == "\\end{table}")
  }
}
