package graft.tools

/** Micro-bench: per-pair cost of the d9 DP variants (r12 scratch). */
object EditBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    def mk(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until 120).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    // two populations: random (dissimilar) and near-dup (common prefix)
    val base = mk(1)
    val rand = (0 until 1000).map(i => mk(i)).toArray
    val near = (0 until 1000).map { i =>
      base.substring(0, 100) + mk(i + 5000).substring(0, 20) }.toArray
    val cps = (s: String) => s.codePoints().toArray
    val randC = rand.map(cps); val nearC = near.map(cps)
    import org.apache.spark.unsafe.types.UTF8String
    val randU = rand.map(UTF8String.fromString)
    val nearU = near.map(UTF8String.fromString)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val acc = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $dt%.2f s (acc=$acc) -> ${dt * 1e9 / 499500}%.0f ns/pair")
    }
    def viaKernel(tag: String, docs: Array[String]): Unit = time(tag) {
      val mem = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
      graft.functions.TextKernels.chunkPairEdits(mem, null, 60).length.toLong
    }
    for (_ <- 1 to 3) {
      viaKernel("rand kernel(Myers)", rand)
      viaKernel("near kernel(Myers)", near)
      time("rand boundedEdit") {
        var acc = 0L; var i = 0
        while (i < 1000) { var j = i + 1; while (j < 1000) {
          acc += graft.functions.TextKernels.boundedEdit(randC(i), randC(j), 60); j += 1 }; i += 1 }
        acc }
      time("near boundedEdit") {
        var acc = 0L; var i = 0
        while (i < 1000) { var j = i + 1; while (j < 1000) {
          acc += graft.functions.TextKernels.boundedEdit(nearC(i), nearC(j), 60); j += 1 }; i += 1 }
        acc }
      time("rand sparkDP    ") {
        var acc = 0L; var i = 0
        while (i < 1000) { var j = i + 1; while (j < 1000) {
          acc += randU(i).levenshteinDistance(randU(j), 60); j += 1 }; i += 1 }
        acc }
      time("near sparkDP    ") {
        var acc = 0L; var i = 0
        while (i < 1000) { var j = i + 1; while (j < 1000) {
          acc += nearU(i).levenshteinDistance(nearU(j), 60); j += 1 }; i += 1 }
        acc }
    }
  }
}
