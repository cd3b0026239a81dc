package graft

/** Semantic properties of the vector-family queries that the DuckDB
  * oracle's hash compare can't express directly: cluster membership
  * consistency for v11 and code/error invariants for v12. */
class VectorQuerySpec extends SparkSpecBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("v11 clusters agree with the v5 pair graph (membership + labels)") {
    val pairs = run("v5_embed_neardup").select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val cluster = run("v11_embed_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every near-dup pair must land in one cluster
    pairs.foreach { case (a, b) => assert(cluster(a) == cluster(b)) }
    // the label is the smallest member id (deterministic representative)
    cluster.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min)
    }
    // exactly the paired ids are clustered — no singleton rows
    assert(cluster.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("v18 JL projection matches a brute-force ±1 md5 matrix recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Long, d: Int): Long = {
      val hex = md.digest(s"${j}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1L else -1L
    }
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val expected = (for {
      (id, emb) <- vecs
      j <- 0L until 8L
    } yield (id, j, emb.zipWithIndex.map { case (v, d) =>
      math.floor(v.toDouble * 1e6).toLong * sign(j, d)
    }.sum)).sortBy(t => (t._1, t._2)).toSeq
    val got = run("v18_rand_proj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the matrix is not degenerate: both signs occur in row 0
    assert((0 until 64).map(sign(0L, _)).toSet == Set(1L, -1L))
  }

  test("v19 Gram sums match a brute-force big-integer recompute") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v.toDouble * 1e6).toLong))
    val expected = (for { i <- 0 until 8; j <- i until 8 } yield
      (i.toLong, j.toLong,
       vecs.map(e => BigInt(e(i)) * BigInt(e(j))).sum.toString)).toSeq
    val got = run("v19_embed_gram").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected)
    // diagonal entries are sums of squares — strictly positive
    assert(got.filter(t => t._1 == t._2).forall(t => BigInt(t._3) > 0))
  }

  test("v12 PQ: one in-range code per (vector, subspace), non-negative err") {
    val rows = run("v12_pq_codes").collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))
    }
    val nVecs = graft.Tables.embeddings(spark, sfDir).count()
    assert(rows.length == 4 * nVecs)
    // every (vec, subspace) exactly once
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    assert(rows.forall(t => t._2 >= 0 && t._2 < 4))
    assert(rows.forall(t => t._3 >= 0 && t._3 < 8))
    // squared reconstruction error: tiny fp negatives are the only slack
    assert(rows.forall(_._4 >= -1e-9))
    // quantization actually clusters: codes are not all one cell
    assert(rows.map(_._3).distinct.length > 1)
  }
}
