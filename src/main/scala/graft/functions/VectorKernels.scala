package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Compiled kernels for embedding math (dot products, norms, hyperplane
  * LSH buckets).
  *
  * Same rationale as TextKernels: `zip_with`/`aggregate` evaluate
  * per-element in the interpreter, and ANN candidate scoring does
  * |pairs|·64 of those — compiled loops with primitive-array signatures
  * remove the dispatch entirely. The arithmetic mirrors the SQL fragments
  * in operators.Similarity exactly: elementwise double casts, strict
  * left-to-right accumulation (so results match the DuckDB oracle
  * bit-for-bit), and hyperplane weights derived from
  * w(j,i) = ((1 + (j·64+i)·2654435761) mod 1000003)/1000003 − 0.5.
  */
object VectorKernels {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** LSH bucket from sign bits of `nPlanes` pseudo-random hyperplanes. */
  def bucket(e: Array[Float], nPlanes: Int, dims: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      var d = 0.0
      var i = 0
      while (i < e.length) {
        val w = ((1L + (j.toLong * dims + i) * 2654435761L) % 1000003L)
          .toDouble / 1000003.0 - 0.5
        d += e(i).toDouble * w
        i += 1
      }
      if (d >= 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  val dotUdf: UserDefinedFunction =
    udf((a: Array[Float], b: Array[Float]) => dot(a, b))
  val normUdf: UserDefinedFunction = udf((a: Array[Float]) => norm(a))
  def bucketUdf(nPlanes: Int, dims: Int): UserDefinedFunction =
    udf((e: Array[Float]) => bucket(e, nPlanes, dims))
}
