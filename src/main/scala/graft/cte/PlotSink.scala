package graft.cte

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** PNG plot sink — SURVEY.md §2.1 S7, the last reference output the
  * engine lacked. The reference renders scatter-plus-fit figures with
  * matplotlib (uvis_external_cte_plots.py:247-289 flux-ratio vs ypos per
  * flux bin with its fitted line; :376-421 slope vs time); this sink
  * re-expresses that with JDK-ONLY headless rasterization
  * (`BufferedImage` + `ImageIO`) — no plotting dependency, runs on any
  * executor-less driver JVM.
  *
  * Scale contract: the sink draws PLOT DATA — the per-bin clipped points
  * and fitted slopes the reference itself passes to matplotlib — which
  * is dimension-sized by construction (stars per pair, not corpus rows).
  * Callers collect that bounded frame and hand arrays in; raw tables
  * never reach the driver. Rendering is deterministic (fixed palette,
  * fixed fonts-as-strokes layout), so artifact bytes are reproducible
  * across runs — the property the text sinks already have.
  */
object PlotSink {

  /** One plotted series: scatter points plus an optional fitted line
    * y = icept + slope·x drawn across the x-range of the points. */
  case class Series(label: String, xs: Array[Double], ys: Array[Double],
                    fit: Option[(Double, Double)] = None) {
    require(xs.length == ys.length, s"series '$label': ${xs.length} xs vs ${ys.length} ys")
  }

  /** The reference's qualitative tab10-ish cycle, fixed for determinism. */
  private val palette = Array(
    new Color(31, 119, 180), new Color(255, 127, 14),
    new Color(44, 160, 44), new Color(214, 39, 40),
    new Color(148, 103, 189), new Color(140, 86, 75),
    new Color(227, 119, 194), new Color(127, 127, 127))

  private val margin = 70

  /** Render a scatter(+fit) figure to `out` as PNG. Empty series are
    * legal (a bin emptied by clipping still appears in the legend, as in
    * the reference's zero-filled result rows). */
  def scatterPng(out: File, title: String, xLabel: String, yLabel: String,
                 series: Seq[Series], width: Int = 800,
                 height: Int = 600): Unit = {
    val allX = series.flatMap(_.xs)
    val allY = series.flatMap(_.ys)
    // degenerate inputs still produce a well-formed (empty-axes) figure
    val (x0, x1) = pad(if (allX.nonEmpty) (allX.min, allX.max) else (0.0, 1.0))
    val (y0, y1) = pad(if (allY.nonEmpty) (allY.min, allY.max) else (0.0, 1.0))

    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_OFF) // AA is platform-variable; off = reproducible bytes
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)

      def px(x: Double) = margin + ((x - x0) / (x1 - x0) * (width - 2 * margin)).round.toInt
      def py(y: Double) = height - margin - ((y - y0) / (y1 - y0) * (height - 2 * margin)).round.toInt

      // axes + ticks
      g.setColor(Color.BLACK)
      g.drawLine(margin, height - margin, width - margin, height - margin)
      g.drawLine(margin, margin, margin, height - margin)
      g.setFont(new Font(Font.MONOSPACED, Font.PLAIN, 11))
      for (i <- 0 to 5) {
        val fx = x0 + (x1 - x0) * i / 5.0
        val fy = y0 + (y1 - y0) * i / 5.0
        val (tx, ty) = (px(fx), py(fy))
        g.drawLine(tx, height - margin, tx, height - margin + 5)
        g.drawString(fmt(fx), tx - 18, height - margin + 18)
        g.drawLine(margin - 5, ty, margin, ty)
        g.drawString(fmt(fy), 8, ty + 4)
      }
      g.setFont(new Font(Font.MONOSPACED, Font.BOLD, 13))
      g.drawString(title, margin, margin - 28)
      g.drawString(xLabel, width / 2 - 4 * xLabel.length, height - 18)
      g.drawString(yLabel, 8, margin - 10)

      // series: points then fit line, palette-cycled; legend top-right
      series.zipWithIndex.foreach { case (s, i) =>
        val c = palette(i % palette.length)
        g.setColor(c)
        var j = 0
        while (j < s.xs.length) {
          g.fillRect(px(s.xs(j)) - 2, py(s.ys(j)) - 2, 5, 5)
          j += 1
        }
        s.fit.foreach { case (icept, slope) =>
          if (s.xs.nonEmpty) {
            val (lx0, lx1) = (s.xs.min, s.xs.max)
            g.setStroke(new BasicStroke(2f))
            g.drawLine(px(lx0), py(icept + slope * lx0),
              px(lx1), py(icept + slope * lx1))
            g.setStroke(new BasicStroke(1f))
          }
        }
        val ly = margin + 16 * i
        g.fillRect(width - margin - 150, ly - 8, 10, 10)
        g.setColor(Color.BLACK)
        g.setFont(new Font(Font.MONOSPACED, Font.PLAIN, 11))
        g.drawString(s.label, width - margin - 135, ly + 1)
      }
    } finally g.dispose()
    Option(out.getParentFile).foreach(_.mkdirs())
    ImageIO.write(img, "png", out): Unit
  }

  private def pad(r: (Double, Double)): (Double, Double) = {
    val (lo, hi) = r
    val span = if (hi > lo) hi - lo else math.max(math.abs(hi), 1.0)
    (lo - 0.05 * span, hi + 0.05 * span)
  }

  // Locale.ROOT, not the default-locale f-interpolator: a comma-decimal
  // locale would change tick-label text and therefore the PNG bytes,
  // breaking the byte-reproducibility this sink promises.
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3g", Double.box(v))
}
