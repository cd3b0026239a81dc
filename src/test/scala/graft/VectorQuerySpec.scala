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
