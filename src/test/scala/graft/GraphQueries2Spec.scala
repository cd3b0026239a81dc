package graft

import org.apache.spark.sql.functions._

/** gr2 (oriented triangle counting) and gr3 (bounded-hop BFS) against
  * brute-force recomputations of the same co-supplier graph — the spec
  * rebuilds the edge set naively from the corpus and checks the
  * distributed answers bit-for-bit. sf0.001 keeps the brute force tiny
  * (10 suppliers) while exercising every join in the real plans. */
class GraphQueries2Spec extends SparkSpecBase {

  /** The co-supplier edge set (u < v), brute-forced via collect. */
  private lazy val edges: Set[(Long, Long)] = {
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.groupBy(_._1).values.flatMap { grp =>
      val sks = grp.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- (i + 1) until sks.size)
        yield (sks(i), sks(j))
    }.toSet
  }

  test("pair-pack precondition: supplier ids stay far below 2^31") {
    // coSupplierPairsPerOrder packs pairs as u*2^32 + v; a suppkey at or
    // above 2^31 would silently overflow the BIGINT. TPC-H suppkeys are
    // ~1e4·SF and ScaleUp's key shift multiplies by the replication
    // factor, so the bound holds by construction at any realistic SF —
    // this pins it against a future generator change.
    val mx = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(max(col("l_suppkey").cast("long"))).head().getLong(0)
    assert(mx < (1L << 31),
      s"l_suppkey max $mx would overflow the u<<32|v pair packing")
  }

  test("gr2 per-doc triangle counts match the brute-force enumeration " +
       "over the d4 pair graph") {
    val pairEdges = operators.Dedup
      .nearDupPairs(Tables.documents(spark, sfDir))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = pairEdges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      (u, v) <- pairEdges
      w <- adj(u) if w > v && pairEdges((v, w))
    } {
      triCount(u) += 1; triCount(v) += 1; triCount(w) += 1
    }
    val expected = triCount.toSeq
      .sortBy { case (n, c) => (-c, n) }.take(20)
    val got = SparkEntry.queries("gr2_triangles")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(expected.nonEmpty) // the planted corpus actually has triangles
  }

  test("gr3 hop histogram matches a brute-force BFS from the min node") {
    val adj = edges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keySet
    val src = nodes.min
    var dist = Map(src -> 0L)
    var frontier = Set(src)
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj).diff(dist.keySet)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    val expected = nodes.toSeq
      .map(n => dist.getOrElse(n, -1L))
      .groupBy(identity).map { case (h, xs) => (h, xs.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("gr3_bfs_hops")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // exactly one source at hop 0
    assert(got.find(_._1 == 0L).map(_._2).contains(1L))
    // histogram covers every node exactly once
    assert(got.map(_._2).sum == nodes.size.toLong)
  }

  test("gr4 weighted distances match a brute-force min-plus relaxation") {
    // rebuild the weighted edge set: w = max(1, 10 - shared-order count)
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val shared = rows.groupBy(_._1).values.flatMap { grp =>
      val sks = grp.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- (i + 1) until sks.size)
        yield (sks(i), sks(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val wAdj = shared.toSeq.flatMap { case ((u, v), n) =>
      val w = math.max(1L, 10L - n)
      Seq((u, v, w), (v, u, w))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(t => (t._2, t._3)) }
    val src = wAdj.keySet.min
    var dist = Map(src -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (u, du) =>
        wAdj.getOrElse(u, Seq.empty).map { case (v, w) => (v, du + w) }
      } ++ dist.toSeq
      dist = relaxed.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    }
    val expected = dist.toSeq.map { case (n, d) => (d, n) }
      .sorted.take(15).map { case (d, n) => (n, d) }
    val got = SparkEntry.queries("gr4_sssp")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the source heads the list at distance 0
    assert(got.head == ((src, 0L)))
  }

  test("gr5 peel counts match a brute-force k-core peel of the pair graph") {
    val pairEdges = operators.Dedup
      .nearDupPairs(Tables.documents(spark, sfDir))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var es = pairEdges.flatMap(e => Seq(e, e.swap))
    var nodes = es.map(_._1)
    val removed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (i <- 1 to 3) {
      val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size }
      val kept = nodes.filter(n => deg.getOrElse(n, 0) >= 2)
      removed += ((i.toLong, (nodes.size - kept.size).toLong))
      es = es.filter(e => kept(e._1) && kept(e._2))
      nodes = kept
    }
    val expected =
      (removed :+ ((-1L, nodes.size.toLong))).sortBy(_._1).toSeq
    val got = SparkEntry.queries("gr5_kcore")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // conservation: removed + core == all nodes ever seen
    assert(got.map(_._2).sum ==
      pairEdges.flatMap(p => Seq(p._1, p._2)).size.toLong)
  }
}
