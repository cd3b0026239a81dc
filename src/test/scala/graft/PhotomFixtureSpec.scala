package graft

/** Golden checks for the pixel-level photometry fixture (a3): the
  * reference's photom_tests_modeldata.py synthetic Gaussian star has a
  * known analytic curve of growth (total flux 2π·A·σ² = 5654.87 for
  * A=100, σ=3), so the aperture sums, pixel counts, and meanclip
  * background are all predictable — the same dual-engine cross-check the
  * reference runs between IRAF and photutils, here between the engine
  * and closed form. */
class PhotomFixtureSpec extends SparkSpecBase {

  test("a3 aperture curve of growth matches the analytic Gaussian star") {
    val rows = SparkEntry.queries("a3_pixel_meanclip")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(7)))
    assert(rows.map(_._1).toSeq == Seq(2, 3, 5, 7, 10, 12))

    // pixel counts are exact lattice-disk counts |{(dx,dy): dx²+dy² ≤ r²}|
    def diskCount(r: Int): Long =
      (for { dx <- -26 to 23; dy <- -26 to 23
             if dx * dx + dy * dy <= r * r } yield 1).size.toLong
    rows.foreach { case (r, n, _, _, _) => assert(n == diskCount(r), s"r=$r") }

    // curve of growth: monotone, converging to 2π·A·σ² within quantization
    val flux = rows.map(_._3)
    assert(flux.sliding(2).forall(p => p(1) >= p(0)))
    val total = 2.0 * math.Pi * 100.0 * 9.0 // 5654.87
    assert(math.abs(flux.last - total) / total < 0.02, flux.last)
    // r=10 = 3.3σ already holds ~99.6% of the flux
    assert(flux(4) > 0.99 * flux.last)

    // the star sits on a zero background: the annulus meanclip must find
    // (nearly) nothing, and the net flux subtracts it
    rows.foreach { case (_, _, tot, bk, net) =>
      assert(bk >= 0.0 && bk < 0.02, bk)
      assert(net <= tot && net > 0.0)
    }
  }
}
