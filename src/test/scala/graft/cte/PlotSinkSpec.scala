package graft.cte

import graft.SparkSpecBase
import java.nio.file.Files
import javax.imageio.ImageIO

/** The S7 PNG sink: JDK-only rasterization must produce decodable,
  * deterministic figures, and the pipeline hook must emit them under the
  * reference's `<stem>_slopes.png` naming. */
class PlotSinkSpec extends SparkSpecBase {

  test("scatterPng renders a decodable, deterministic figure") {
    val dir = Files.createTempDirectory("graft_plot")
    val s = Seq(
      PlotSink.Series("500-2000 e-",
        Array(100.0, 500.0, 900.0, 1300.0), Array(1.00, 0.99, 0.98, 0.97),
        fit = Some((1.0025, -2.5e-5))),
      PlotSink.Series("2000-8000 e-",
        Array(200.0, 700.0, 1200.0), Array(0.995, 0.993, 0.991),
        fit = Some((0.9966, -3.3e-6))),
      PlotSink.Series("empty-bin", Array.empty, Array.empty))
    val f1 = dir.resolve("fig1.png").toFile
    PlotSink.scatterPng(f1, "ngc104", "Y-position_chip2 [pxl]",
      "Flux_chip1 / Flux_chip2", s)
    assert(f1.length > 1000, s"suspiciously small PNG: ${f1.length} bytes")
    val img = ImageIO.read(f1)
    assert(img.getWidth == 800 && img.getHeight == 600)
    // the canvas must actually carry marks: axes, points, lines, legend
    val nonWhite = (for (x <- 0 until img.getWidth; y <- 0 until img.getHeight
      if (img.getRGB(x, y) & 0xffffff) != 0xffffff) yield 1).size
    assert(nonWhite > 2000, s"only $nonWhite painted pixels")

    // byte-level determinism — the same reproducibility contract the
    // text artifacts have
    val f2 = dir.resolve("fig2.png").toFile
    PlotSink.scatterPng(f2, "ngc104", "Y-position_chip2 [pxl]",
      "Flux_chip1 / Flux_chip2", s)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(f1.toPath), Files.readAllBytes(f2.toPath)),
      "two renders of the same figure differ byte-wise")
  }

  test("publishPlots emits one reference-named PNG per populated pair/aperture") {
    val root = Files.createTempDirectory("graft_plotpipe").toString
    val pipe = new CtePipeline(spark, s"$root/warehouse")
    pipe.ingestFileinfo(CteFixtures.fileinfo(spark))
    pipe.ingestPhot(CteFixtures.photLong(spark))
    pipe.computeSlopes(CteFixtures.T)
    pipe.publishPlots(CteFixtures.T, s"$root/out")
    val pngs = new java.io.File(s"$root/out").listFiles()
      .filter(_.getName.endsWith("_slopes.png"))
    assert(pngs.nonEmpty, "no slope PNGs were rendered")
    // naming follows the reference scheme: <im1>_<im2>_r<ap>_slopes.png
    assert(pngs.forall(_.getName.matches(".+_.+_r\\d+_slopes\\.png")),
      pngs.map(_.getName).mkString(", "))
    pngs.foreach { f =>
      val img = ImageIO.read(f)
      assert(img != null && img.getWidth == 800 && img.getHeight == 600,
        s"${f.getName} did not decode")
    }

    // the monitor's primary figure: slope vs time per aperture
    pipe.publishCteVsTimePlot(CteFixtures.T, s"$root/out")
    val timePngs = new java.io.File(s"$root/out").listFiles()
      .filter(_.getName.matches(s"${CteFixtures.T}_cteVStime_r\\d+\\.png"))
    assert(timePngs.nonEmpty, "no cteVStime PNGs were rendered")
    timePngs.foreach(f => assert(ImageIO.read(f) != null))
  }
}
