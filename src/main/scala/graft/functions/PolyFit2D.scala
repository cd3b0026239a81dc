package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed 2-D degree-2 polynomial least squares — the reference's
  * `polyfit2d` (/root/reference/wfc3_cte_monitor/uvis_external_cte_plots.py:
  * 2216-2249) as a single-pass Spark `Aggregator`.
  *
  * Model: z ≈ Σ_{i,j ∈ 0..2} c(i·3+j) · x^j · y^i   (9 coefficients; the
  * reference's x = log10 flux, y = epoch offset, z = CTE slope).
  *
  * The buffer accumulates the 9×9 Gram matrix AᵀA (upper triangle, 45
  * doubles) and the right-hand side Aᵀz (9 doubles) — commutative and
  * mergeable, so the fit runs map-side-partial with one tiny shuffle per
  * group regardless of input size. `finish` solves the normal equations via
  * a symmetric Jacobi eigendecomposition pseudo-inverse, returning the
  * **minimum-norm** solution for rank-deficient groups — matching
  * `np.linalg.lstsq` semantics on the reference's degenerate epochs (all
  * rows sharing one y ⇒ rank 3; SURVEY.md §7.4 item 2).
  */
object PolyFit2D {

  /** terms(x, y) = [x^j·y^i for i in 0..2, j in 0..2], k = i*3+j. */
  def terms(x: Double, y: Double): Array[Double] = {
    val xs = Array(1.0, x, x * x)
    val ys = Array(1.0, y, y * y)
    val t = new Array[Double](9)
    var i = 0
    while (i < 3) {
      var j = 0
      while (j < 3) { t(i * 3 + j) = ys(i) * xs(j); j += 1 }
      i += 1
    }
    t
  }

  /** Evaluate a 9-coefficient fit at (x, y) — the reference's model
    * evaluation (plot_model_on_reality.py:48-113). */
  def eval(c: Array[Double], x: Double, y: Double): Double = {
    val t = terms(x, y)
    var s = 0.0
    var k = 0
    while (k < 9) { s += c(k) * t(k); k += 1 }
    s
  }

  // Buffer layout: [0,45) upper-triangular Gram (row-major, i<=j),
  // [45,54) Aᵀz, [54] row count.
  private val BufLen = 55

  val udaf: Aggregator[(Double, Double, Double), Array[Double], Seq[Double]] =
    new Aggregator[(Double, Double, Double), Array[Double], Seq[Double]] {
      def zero: Array[Double] = new Array[Double](BufLen)

      def reduce(b: Array[Double], in: (Double, Double, Double)): Array[Double] = {
        val (x, y, z) = in
        if (!x.isNaN && !y.isNaN && !z.isNaN) {
          val t = terms(x, y)
          var idx = 0
          var i = 0
          while (i < 9) {
            var j = i
            while (j < 9) { b(idx) += t(i) * t(j); idx += 1; j += 1 }
            b(45 + i) += t(i) * z
            i += 1
          }
          b(54) += 1
        }
        b
      }

      def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
        var i = 0
        while (i < BufLen) { a(i) += b(i); i += 1 }
        a
      }

      def finish(b: Array[Double]): Seq[Double] = {
        if (b(54) < 1) return Seq.fill(9)(Double.NaN)
        val g = Array.ofDim[Double](9, 9)
        var idx = 0
        var i = 0
        while (i < 9) {
          var j = i
          while (j < 9) { g(i)(j) = b(idx); g(j)(i) = b(idx); idx += 1; j += 1 }
          i += 1
        }
        LinAlg.solveMinNorm(g, b.slice(45, 54)).toSeq
      }

      def bufferEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }
}

/** Tiny dense linear algebra for 9×9 normal equations — no external deps. */
object LinAlg {

  /** Min-norm solution of symmetric positive-semidefinite A·c = r via a
    * cyclic Jacobi eigendecomposition pseudo-inverse.
    *
    * The system is diagonally equilibrated first (D·A·D with
    * D = diag(1/√aᵢᵢ)): polynomial Gram matrices mix x⁴-scale and 1-scale
    * entries (condition ~1e14 for epoch offsets of ±300), and an
    * unequilibrated eigen-tolerance would discard genuinely informative
    * directions. Rank is then decided at 1e-12·λmax of the equilibrated
    * matrix, mirroring lstsq's rcond semantics. */
  def solveMinNorm(aIn: Array[Array[Double]], r0: Array[Double]): Array[Double] = {
    val n = r0.length
    val d = Array.tabulate(n) { i =>
      val aii = aIn(i)(i)
      if (aii > 0) 1.0 / math.sqrt(aii) else 1.0
    }
    val a = Array.tabulate(n, n)((i, j) => aIn(i)(j) * d(i) * d(j))
    val r = Array.tabulate(n)(i => r0(i) * d(i))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 50 && offDiag(a) > 1e-14 * frobenius(a)) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-300) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(n)(i => a(i)(i))
    val lmax = eig.map(math.abs).max
    val tol = if (lmax > 0) 1e-12 * lmax else 1.0
    // c = V · diag(1/λ where |λ|>tol) · Vᵀ · r
    val vtr = Array.tabulate(n)(k =>
      (0 until n).map(i => v(i)(k) * r(i)).sum)
    val scaled = Array.tabulate(n)(k =>
      if (math.abs(eig(k)) > tol) vtr(k) / eig(k) else 0.0)
    // undo the equilibration: c = D·(V diag(1/λ) Vᵀ)·D·r
    Array.tabulate(n)(i =>
      d(i) * (0 until n).map(k => v(i)(k) * scaled(k)).sum)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(math.max(s, 1e-300))
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
                     p: Int, q: Int): Unit = {
    val n = a.length
    val apq = a(p)(q)
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    // sign(0) must be 1 here: equal diagonal entries (theta = 0) need the
    // full 45° rotation, not a no-op — math.signum would stall Jacobi on
    // any matrix with a repeated diagonal.
    val sgn = if (theta >= 0.0) 1.0 else -1.0
    val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var k = 0
    while (k < n) {
      val akp = a(k)(p); val akq = a(k)(q)
      a(k)(p) = c * akp - s * akq
      a(k)(q) = s * akp + c * akq
      k += 1
    }
    k = 0
    while (k < n) {
      val apk = a(p)(k); val aqk = a(q)(k)
      a(p)(k) = c * apk - s * aqk
      a(q)(k) = s * apk + c * aqk
      val vkp = v(k)(p); val vkq = v(k)(q)
      v(k)(p) = c * vkp - s * vkq
      v(k)(q) = s * vkp + c * vkq
      k += 1
    }
  }
}
