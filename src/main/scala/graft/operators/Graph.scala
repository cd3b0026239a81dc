package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph primitives over edge DataFrames.
  *
  * The near-dup pipeline needs one: connected components over the
  * LSH-candidate pair graph (d4's output), so that transitive duplicate
  * chains A~B~C collapse into ONE cluster even when A≁C directly —
  * the case the greedy drop-the-greater-id rule gets wrong
  * ([[CorpusCuration]]'s documented approximation).
  *
  * Scale shape: label propagation as a loop of (join + min-aggregate),
  * i.e. the CC-MR / large-star family of MapReduce CC algorithms — no
  * driver-side union-find, no adjacency collected anywhere. Each round
  * shuffles the edge table once (hash on vertex id); a path-halving
  * pointer jump (labels joined to themselves) compresses chains so
  * convergence takes O(log diameter) rounds, not O(diameter). Near-dup
  * clusters are shallow (a handful of hops even at corpus scale), so
  * rounds stay single-digit at any data size; the per-round cost is the
  * edge-table join, which partitions by vertex id and never fans out
  * beyond degree. The only driver-side values are the per-round changed
  * counts (one Long each) that decide convergence.
  */
object Graph {

  /** Connected components of the undirected graph given by `edges`:
    * one row per distinct vertex, labeled with the SMALLEST vertex id in
    * its component (deterministic, so oracle-comparable).
    *
    * @param edges    two-column edge list (undirected; direction ignored)
    * @param src      source-id column name
    * @param dst      dest-id column name
    * @param maxIters safety bound; convergence is typically ≤ 5 rounds
    *                 for near-dup graphs (diameter-shallow). Throws if
    *                 hit — a truncated labeling is a WRONG answer, never
    *                 a fallback.
    * @return DataFrame(id, component)
    */
  /** Edge-count bound under which the whole component structure is
    * resolved in ONE executor task instead of the iterative loop. This is
    * the standard two-phase shape of production CC (GraphFrames, CC-MR):
    * contract/propagate distributedly while the graph is big, finish
    * locally the moment it fits a single task — every further distributed
    * round costs a fixed number of shuffle stages that dwarf the actual
    * work on a small remainder (measured here: the d10 pair graph is a
    * few thousand edges, and ~5 loop rounds cost ~6 s of pure stage
    * overhead vs ~0.2 s for the single-task union-find). 16M edges ≈
    * 400 MB through the coalesce(1) — one task, far below executor
    * memory; the crossover was re-measured on the r10 sf10 corpus
    * (13.8M-edge pair graph: distributed CC 37 s vs 9 s local including
    * the move, after the local kernels went CSR — flat arrays, no boxed
    * sets). At real cluster scale a pair graph past this bound runs the
    * distributed rounds regardless; the threshold only decides where
    * "small remainder" ends. */
  private val localFinishEdges = 16000000L

  /** SSSP/BFS keep a LOWER local-finish bound than CC/peel: their
    * bounded-round form runs only ~3 distributed rounds with a
    * broadcast-sized frontier (cheap), so funneling a 10M-edge graph
    * through coalesce(1) loses to the loop (measured on the r10 sf10
    * co-supplier graph: gr3 37.8 s distributed vs 48.4 s local). CC and
    * the peel run more full-table rounds per invocation, which is where
    * the single-task finish pays off at higher edge counts. */
  private val ssspLocalEdges = 2000000L

  /** Node-count bound under which the per-round node-sized table
    * (frontier / rank vector) is BROADCAST instead of co-partitioning
    * the edge table up front. 2M (node, long) rows ≈ 32 MB serialized —
    * comfortably broadcastable on any executor sizing — and the win is
    * one full edge-table exchange avoided per driver invocation (the
    * dominant fixed cost when the graph's node set is dimension-derived:
    * suppliers, documents — which stays bounded while edges grow with
    * the corpus). Estimated with one HLL pass (±5%), so the bound is a
    * soft ceiling, deliberately far under broadcast's hard limits. */
  private val broadcastNodeLimit = 2000000L

  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIters: Int = 25,
                          localThreshold: Long = localFinishEdges): DataFrame = {
    // Symmetrize once; the loop re-reads this table every round.
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Hybrid finish: count() both materializes the persisted edge table
    // (a cost the first loop round would pay anyway) and picks the path.
    // NOT a driver collect — the union-find below runs inside one
    // executor task via mapPartitions on a single coalesced partition.
    if (sym.count() <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val comp = sym
        .select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
            var c = x // path compression
            while (parent.getOrElse(c, c) != c) {
              val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
            }
            r
          }
          it.foreach { case (a, b) =>
            parent.getOrElseUpdate(a, a)
            parent.getOrElseUpdate(b, b)
            val (ra, rb) = (find(a), find(b))
            // min-id root keeps the final labels deterministic
            if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
          }
          // materialize the key set first: find()'s path compression
          // mutates the map, which must not race the iteration
          val ids = parent.keys.toArray
          ids.iterator.map(id => (id, find(id)))
        }
        .toDF("id", "component")
        // Materialize NOW, while sym is still cached: the single-task
        // plan runs under coalesce(1), so a lazy return would recompute
        // the whole (possibly expensive) edge derivation single-threaded
        // at first use — measured 20× on the sf1 near-dup pair graph.
        .localCheckpoint()
      sym.unpersist()
      return comp
    }

    // Each round's labels are localCheckpoint'ed, not just persisted: the
    // loop builds plans on top of the previous round's result, and without
    // lineage truncation the logical plan grows by one join-aggregate per
    // round until analysis itself overflows. Checkpointing keeps every
    // round's plan a constant two joins over materialized inputs. (Local
    // checkpoints live in executor storage; a production job that must
    // survive executor loss sets a checkpoint dir and uses reliable
    // checkpoints — same loop, different sink.)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0) {
      iter += 1
      if (iter > maxIters)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIters rounds")

      // Hop: candidate label = min over {self} ∪ neighbor labels. The
      // previous label rides along as `old` so convergence is read off
      // the checkpointed result below — no extra join per round.
      val nbrMin = sym
        .join(labels.select(col("id").as("a"), col("component")), "a")
        .groupBy(col("b").as("id"))
        .agg(min(col("component")).as("nbr"))
      val hopped = labels.select(col("id"), col("component").as("old"))
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nbr"), col("old")))
            .as("component"))
        .persist() // both halving legs below read it

      // Path halving: component := component(component). Labels are ids,
      // so the pointer table IS the label table — one self-join
      // compresses two hops of any chain into one, giving the O(log)
      // round bound.
      val next = hopped.as("l")
        .join(hopped.select(col("id").as("component"),
          col("component").as("parent")).as("p"), Seq("component"), "left")
        .select(col("id"), col("l.old"),
          least(col("l.component"), coalesce(col("parent"), col("l.component")))
            .as("component"))
        .withColumn("_chg", col("component") =!= col("old"))
        .localCheckpoint()

      changed = next.filter(col("_chg")).count()
      hopped.unpersist()
      // `next` is materialized (and lineage-truncated) by the count above,
      // so the previous round's checkpointed labels are dead — release
      // their executor storage now, or repeated CC queries in one session
      // accumulate one round's worth of blocks per iteration. Dataset
      // .unpersist() can't do this (localCheckpoint storage is RDD-level,
      // invisible to the CacheManager), hence [[release]].
      release(labels)
      labels = next.select("id", "component")
    }
    sym.unpersist()
    labels
  }

  /** Edge-count bound under which per-node triangle counting runs in ONE
    * executor task (the CC/peel hybrid discipline). The distributed plan
    * is 5 shuffle stages (degree agg, two orientation joins, the wedge
    * self-join, the closing join, the corner rollup) — ~4 s of pure
    * stage overhead on a 5k-edge pair graph at sf0.1, where the CSR
    * kernel below does the same arithmetic in milliseconds. 2M oriented
    * edges ≈ 50 MB through coalesce(1); intersection work is output-
    * bound (Σ wedge-closures — clique-shaped near-dup graphs keep it
    * ~linear in edges). Past the bound the wedge join runs distributed
    * regardless — the sf10 pair graph (13.8M edges) stays on that path. */
  private val triangleLocalEdges = 2000000L

  /** Per-node triangle counts over an undirected simple edge list (each
    * edge once, u ≠ v, no parallel edges — d4's pair contract): one row
    * (node, triangles) per node in ≥ 1 triangle. Semantics — and the
    * degree-ordered orientation — match GraphQueries' distributed wedge
    * plan exactly (GraphTriangleSpec pins both paths bit-identical):
    * orient each edge toward the (degree, id)-larger endpoint, count
    * each triangle once at its order-minimal wedge, credit all three
    * corners. Hybrid: below `localThreshold` edges the whole count runs
    * as a CSR merge-intersection in ONE task; above it callers should
    * use the distributed plan (gr2Build branches on the same count()
    * that materializes the persisted pair table). */
  def triangleCountsLocal(pairs: DataFrame, src: String, dst: String)
      : DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val out = pairs
      .select(col(src).cast("long"), col(dst).cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val es = it.toArray
        val m = es.length
        // dense node ids (sort + unique; index via binary search)
        val all = new Array[Long](2 * m)
        var i = 0
        while (i < m) {
          all(2 * i) = es(i)._1; all(2 * i + 1) = es(i)._2; i += 1
        }
        java.util.Arrays.sort(all)
        var n = 0
        i = 0
        while (i < 2 * m) { // unique in place
          if (n == 0 || all(n - 1) != all(i)) { all(n) = all(i); n += 1 }
          i += 1
        }
        val ids = java.util.Arrays.copyOf(all, n)
        def idx(x: Long) = java.util.Arrays.binarySearch(ids, x)
        val ea = new Array[Int](m)
        val eb = new Array[Int](m)
        val deg = new Array[Int](n)
        i = 0
        while (i < m) {
          val a = idx(es(i)._1); val b = idx(es(i)._2)
          ea(i) = a; eb(i) = b; deg(a) += 1; deg(b) += 1
          i += 1
        }
        // orientation under the total order (degree, id) — the same
        // tie-break as the distributed plan's (du, u) < (dv, v)
        def less(a: Int, b: Int): Boolean =
          deg(a) < deg(b) || (deg(a) == deg(b) && ids(a) < ids(b))
        // CSR of out-neighbors
        val odeg = new Array[Int](n)
        i = 0
        while (i < m) {
          if (less(ea(i), eb(i))) odeg(ea(i)) += 1 else odeg(eb(i)) += 1
          i += 1
        }
        val off = new Array[Int](n + 1)
        i = 0
        while (i < n) { off(i + 1) = off(i) + odeg(i); i += 1 }
        val cur = java.util.Arrays.copyOf(off, n)
        val adj = new Array[Int](m)
        i = 0
        while (i < m) {
          if (less(ea(i), eb(i))) { adj(cur(ea(i))) = eb(i); cur(ea(i)) += 1 }
          else { adj(cur(eb(i))) = ea(i); cur(eb(i)) += 1 }
          i += 1
        }
        i = 0
        while (i < n) {
          java.util.Arrays.sort(adj, off(i), off(i + 1)); i += 1
        }
        // every triangle {a,b,c} with a→b, a→c, b→c appears exactly once:
        // as the sorted-merge intersection hit c of the oriented edge
        // (a, b); each corner gets the credit (the rollup the distributed
        // plan does over its tris table)
        val cnt = new Array[Long](n)
        var u = 0
        while (u < n) {
          var p = off(u)
          while (p < off(u + 1)) {
            val v = adj(p)
            var x = off(u); var y = off(v)
            while (x < off(u + 1) && y < off(v + 1)) {
              val a = adj(x); val b = adj(y)
              if (a == b) {
                cnt(u) += 1; cnt(v) += 1; cnt(a) += 1; x += 1; y += 1
              } else if (a < b) x += 1
              else y += 1
            }
            p += 1
          }
          u += 1
        }
        val fc = cnt
        (0 until n).iterator.collect {
          case v if fc(v) > 0 => (ids(v), fc(v))
        }
      }
      .toDF("node", "triangles")
      // materialize while upstream caches are warm — the coalesce(1)
      // plan would otherwise recompute the whole pair derivation
      // single-threaded at first use (the CC local-path lesson)
      .localCheckpoint()
    out
  }

  /** The local-path bound, exposed for the caller's branch decision. */
  def triangleLocalBound: Long = triangleLocalEdges

  /** Bounded k-core peel: `rounds` iterations of "drop every node whose
    * current degree is < k" over the undirected graph, reporting the
    * per-round removal counts plus the surviving core size (round = -1).
    * Same hybrid shape as [[connectedComponents]]: the count() that
    * materializes the symmetrized edge table also picks the path —
    * below the threshold the whole peel runs in ONE executor task
    * (every distributed round costs a fixed number of stages that dwarf
    * the actual work on a small graph); above it, each round is one
    * degree aggregate + two semi-joins, localCheckpoint-truncated so the
    * plan stays flat. Counts are exact integers on both paths.
    * @return DataFrame(round: long, n_nodes: long), rounds 1..R then -1 */
  def kCorePeel(edges: DataFrame, src: String, dst: String, k: Int,
                rounds: Int,
                localThreshold: Long = localFinishEdges): DataFrame = {
    // rounds = 0 would return an empty union on the local path but NPE on
    // the distributed one — reject it uniformly instead of diverging.
    require(rounds >= 1, s"kCorePeel needs rounds >= 1, got $rounds")
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (sym.count() <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val out = sym
        .select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)]
        .coalesce(1)
        .mapPartitions(it => peelLocal(it, k, Some(rounds), 0, ""))
        .toDF("round", "n_nodes")
        // materialize before unpersisting sym (see connectedComponents)
        .localCheckpoint()
      sym.unpersist()
      return out
    }

    var cur = sym.select(col("a").as("src"), col("b").as("dst"))
      .localCheckpoint()
    var nodes = cur.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var out: DataFrame = null
    for (i <- 1 to rounds) {
      val deg = cur.groupBy("src").agg(count(lit(1)).as("d"))
      val kept = nodes
        .join(deg.where(col("d") >= k),
          nodes("node") === deg("src"), "left_semi")
        .localCheckpoint()
      val removed = nodes.join(kept, Seq("node"), "left_anti")
        .agg(count(lit(1)).as("n_nodes"))
        .select(lit(i.toLong).as("round"), col("n_nodes"))
      out = if (out == null) removed else out.unionByName(removed)
      val nextCur = cur
        .join(kept, cur("src") === kept("node"), "left_semi")
        .join(kept.select(col("node").as("kn")),
          col("dst") === col("kn"), "left_semi")
        .localCheckpoint()
      // The superseded edge table is reachable from nothing the caller
      // ever sees (`out` references only nodes/kept), so its checkpoint
      // blocks would leak ~rounds full edge tables per invocation — the
      // connectedComponents discipline, applied here: free it the moment
      // its successor is materialized (localCheckpoint() above is eager).
      release(cur)
      cur = nextCur
      nodes = kept
    }
    sym.unpersist()
    release(cur) // final edge table: also unreachable from the result
    out.unionByName(
      nodes.agg(count(lit(1)).as("n_nodes"))
        .select(lit(-1L).as("round"), col("n_nodes")))
  }

  // ---------------------------------------------------------------------
  // Run-to-FIXPOINT variants. The bounded-round forms above (and the gr
  // query pack's 3-round unrolls) exist for exact SQL oracles; a
  // production caller asks for "the" BFS/SSSP/k-core/PageRank, i.e. the
  // converged answer. Each fixpoint driver below is the
  // connectedComponents loop discipline applied to its algorithm:
  //   - hybrid: below `localThreshold` edges the whole iteration runs in
  //     ONE executor task (each distributed round costs a fixed number of
  //     shuffle stages that dwarf the real work on a small graph);
  //   - distributed: one hash join + one associative min/sum aggregate
  //     per round, localCheckpoint-truncated lineage, superseded state
  //     released as soon as its successor materializes;
  //   - termination DETECTED (changed-count = 0 / max-delta ≤ tol), with
  //     a maxIters throw — a truncated answer is a WRONG answer, never a
  //     fallback.
  // All arithmetic is integer (min-plus / integer-unit ranks), so both
  // paths — and any cluster layout — produce bit-identical results.
  // ---------------------------------------------------------------------

  /** Single-source shortest distances — min-plus frontier relaxation
    * (Bellman–Ford with a frontier: each round relaxes only edges out
    * of nodes whose distance improved last round). BFS hop distance is
    * the `weight = None` special case.
    *
    * With `rounds = None` the loop runs to FIXPOINT (terminates when a
    * round improves nothing; maxIters throw). With `rounds = Some(k)`
    * it runs exactly k rounds (or until the frontier empties): after k
    * frontier rounds dist(v) = min over ≤ k-edge paths — precisely the
    * bounded-unroll semantics of the gr3/gr4 oracles, so those queries
    * route through here and inherit the hybrid local finish (the
    * distributed unroll costs ~2 stages/round of pure overhead on a
    * dimension-sized graph; measured 7-12 s vs ~2 s at sf0.1).
    *
    * @param edges    DIRECTED edge list (symmetrize first for an
    *                 undirected graph, as the gr3/gr4 queries do)
    * @param weight   optional positive integer weight column; None → 1
    * @param source   source node id; default = smallest src id
    * @return (node, dist) for every node REACHED within the round bound
    */
  def ssspFixpoint(edges: DataFrame, src: String, dst: String,
                   weight: Option[String] = None,
                   source: Option[Long] = None,
                   maxIters: Int = 200,
                   localThreshold: Long = ssspLocalEdges,
                   rounds: Option[Int] = None,
                   broadcastLimit: Long = broadcastNodeLimit): DataFrame = {
    val e = weight match {
      case Some(w) => edges.select(col(src).cast("long").as("a"),
        col(dst).cast("long").as("b"), col(w).cast("long").as("w"))
      case None => edges.select(col(src).cast("long").as("a"),
        col(dst).cast("long").as("b"), lit(1L).as("w"))
    }
    val eRaw = e.persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = eRaw.count()
    val spark = edges.sparkSession
    // min over an empty table is NULL → getLong would NPE; an empty graph
    // has a well-defined answer (nothing reachable), so return it instead
    // of requiring the caller to special-case it.
    if (nEdges == 0L) {
      eRaw.unpersist()
      return spark.emptyDataFrame
        .select(lit(0L).as("node"), lit(0L).as("dist")).limit(0)
    }
    val s0: Long = source.getOrElse(eRaw.agg(min(col("a"))).head().getLong(0))

    if (nEdges <= localThreshold) {
      import spark.implicits._
      val out = eRaw.as[(Long, Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          // CSR-packed frontier relaxation (the pageRankFixpoint kernel
          // discipline): one boxing pass to pack ids dense, then rounds
          // are pure array arithmetic. Batch-per-round updates (`nd`
          // staging array) preserve the bounded-round semantics exactly:
          // after k rounds dist = min over ≤ k-edge paths, no in-round
          // cascading.
          val es = it.toArray
          val n2i = scala.collection.mutable.LongMap.empty[Int]
          val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
          def idOf(x: Long): Int =
            n2i.getOrElseUpdate(x, { ids += x; ids.size - 1 })
          val m = es.length
          val srcId = new Array[Int](m)
          val dstId = new Array[Int](m)
          val ws = new Array[Long](m)
          var i = 0
          while (i < m) {
            srcId(i) = idOf(es(i)._1); dstId(i) = idOf(es(i)._2)
            ws(i) = es(i)._3; i += 1
          }
          // idOf(s0) AFTER the edge pass: a caller-supplied source absent
          // from the edge set still gets a node slot, so (s0, 0) is
          // emitted — the distributed path's seed row behaves the same.
          val sI = idOf(s0)
          val n = ids.size
          val off = new Array[Int](n + 1)
          i = 0; while (i < m) { off(srcId(i) + 1) += 1; i += 1 }
          i = 0; while (i < n) { off(i + 1) += off(i); i += 1 }
          val tgt = new Array[Int](m)
          val tw = new Array[Long](m)
          val pos = java.util.Arrays.copyOf(off, n)
          i = 0
          while (i < m) {
            val s = srcId(i); tgt(pos(s)) = dstId(i); tw(pos(s)) = ws(i)
            pos(s) += 1; i += 1
          }
          val INF = Long.MaxValue
          val dist = Array.fill(n)(INF)
          val nd = Array.fill(n)(INF)
          var frontier = new Array[Int](math.max(n, 1))
          var nextFrontier = new Array[Int](math.max(n, 1))
          var fLen = 0
          if (sI >= 0) { dist(sI) = 0L; frontier(0) = sI; fLen = 1 }
          val touched = new Array[Int](n)
          var iter = 0
          while (fLen > 0 && !rounds.contains(iter)) {
            iter += 1
            if (rounds.isEmpty && iter > maxIters)
              throw new IllegalStateException(
                s"ssspFixpoint did not converge in $maxIters rounds")
            var nTouched = 0
            var fi = 0
            while (fi < fLen) {
              val u = frontier(fi)
              val du = dist(u)
              var j = off(u)
              val end = off(u + 1)
              while (j < end) {
                val t = tgt(j)
                val cand = du + tw(j)
                if (cand < dist(t) && cand < nd(t)) {
                  if (nd(t) == INF) { touched(nTouched) = t; nTouched += 1 }
                  nd(t) = cand
                }
                j += 1
              }
              fi += 1
            }
            var nf = 0
            var ti = 0
            while (ti < nTouched) {
              val t = touched(ti)
              if (nd(t) < dist(t)) {
                dist(t) = nd(t); nextFrontier(nf) = t; nf += 1
              }
              nd(t) = INF
              ti += 1
            }
            val tmp = frontier; frontier = nextFrontier; nextFrontier = tmp
            fLen = nf
          }
          val fd = dist
          (0 until n).iterator.collect {
            case v if fd(v) != INF => (ids(v), fd(v))
          }
        }
        .toDF("node", "dist")
      val outDone = out.localCheckpoint()
      eRaw.unpersist()
      return outDone
    }

    // The frontier is node-sized, and for graphs whose node set is
    // dimension-derived (co-supplier, co-purchase) it stays broadcastable
    // at ANY corpus scale — then pre-shuffling the EDGE table by key is a
    // full wasted exchange (the per-round join broadcasts the frontier and
    // streams the cached edges in place). Only a genuinely large node set
    // (web-scale graphs) justifies co-partitioning the edges once so the
    // per-round shuffle falls on the frontier alone. One HLL pass decides.
    val nNodesApprox =
      eRaw.agg(approx_count_distinct(col("a")).as("n")).head().getLong(0)
    // HLL estimates carry ±~2-5% error: a node set slightly OVER the
    // intended ceiling can be estimated under it, and then a node-sized
    // frontier gets broadcast every round. Apply the soft-ceiling margin
    // in code, not just in the comment: accept only estimates that the
    // HLL error band cannot push past the limit.
    val bcastFrontier = nNodesApprox <= (0.9 * broadcastLimit).toLong
    val eP =
      if (bcastFrontier) eRaw
      else {
        val p = e.repartition(col("a")).persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        eRaw.unpersist()
        p
      }

    var dist = spark.range(1).select(lit(s0).as("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var iter = 0
    var changed = 1L
    while (changed > 0 && !rounds.contains(iter)) {
      iter += 1
      if (rounds.isEmpty && iter > maxIters)
        throw new IllegalStateException(
          s"ssspFixpoint did not converge in $maxIters rounds")
      val fSide = if (bcastFrontier) broadcast(frontier) else frontier
      val relax = fSide.join(eP, fSide("node") === eP("a"))
        .select(col("b").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy("node").agg(min(col("nd")).as("nd"))
      val merged = dist.select(col("node"), col("dist").as("old"))
        .join(relax, Seq("node"), "full_outer")
        .select(col("node"),
          coalesce(col("old"), lit(Long.MaxValue)).as("old"),
          least(coalesce(col("old"), col("nd")),
                coalesce(col("nd"), col("old"))).as("dist"))
        .withColumn("_chg", col("dist") < col("old"))
        .localCheckpoint()
      changed = merged.filter(col("_chg")).count()
      release(dist) // superseded distance table (frontier shares its RDD)
      dist = merged.select("node", "dist")
      frontier = merged.filter(col("_chg")).select("node", "dist")
    }
    eP.unpersist()
    dist
  }

  /** BFS hop distances to fixpoint — [[ssspFixpoint]] with unit weights. */
  def bfsFixpoint(edges: DataFrame, src: String, dst: String,
                  source: Option[Long] = None,
                  maxIters: Int = 200,
                  localThreshold: Long = ssspLocalEdges): DataFrame =
    ssspFixpoint(edges, src, dst, None, source, maxIters, localThreshold)

  /** [[kCorePeel]] iterated until a round removes NOBODY — the true
    * k-core. Output matches kCorePeel's convention ((round, n_removed)
    * rows 1..T, then the surviving core size under round = -1), where T
    * is the LAST round that removed anyone (0 rows of rounds if the
    * whole graph is already a k-core). */
  def kCoreFixpoint(edges: DataFrame, src: String, dst: String, k: Int,
                    maxIters: Int = 200,
                    localThreshold: Long = localFinishEdges): DataFrame = {
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (sym.count() <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val out = sym
        .select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)]
        .coalesce(1)
        .mapPartitions(it => peelLocal(it, k, None, maxIters,
          s"kCoreFixpoint did not converge in $maxIters rounds"))
        .toDF("round", "n_nodes")
        .localCheckpoint()
      sym.unpersist()
      return out
    }

    var cur = sym.select(col("a").as("src"), col("b").as("dst"))
      .localCheckpoint()
    var nodes = cur.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var out: DataFrame = null
    var iter = 0
    var removed = -1L
    while (removed != 0L) {
      iter += 1
      if (iter > maxIters) throw new IllegalStateException(
        s"kCoreFixpoint did not converge in $maxIters rounds")
      val deg = cur.groupBy("src").agg(count(lit(1)).as("d"))
      val kept = nodes
        .join(deg.where(col("d") >= k),
          nodes("node") === deg("src"), "left_semi")
        .localCheckpoint()
      removed = nodes.count() - kept.count()
      if (removed > 0L) {
        val row = nodes.sparkSession.range(1)
          .select(lit(iter.toLong).as("round"), lit(removed).as("n_nodes"))
        out = if (out == null) row else out.unionByName(row)
        val nextCur = cur
          .join(kept, cur("src") === kept("node"), "left_semi")
          .join(kept.select(col("node").as("kn")),
            col("dst") === col("kn"), "left_semi")
          .localCheckpoint()
        release(cur)   // superseded edge table (kCorePeel's discipline)
        release(nodes) // counts are already driver-side scalars here
        cur = nextCur
        nodes = kept
      } else {
        release(kept)
      }
    }
    val core = nodes.count()
    sym.unpersist()
    release(cur)
    release(nodes)
    val finalRow = edges.sparkSession.range(1)
      .select(lit(-1L).as("round"), lit(core).as("n_nodes"))
    if (out == null) finalRow else out.unionByName(finalRow)
  }

  /** Integer-unit PageRank (the gr1 semantics: ranks in 1e-12 units,
    * floor-division contributions, damping 0.15/0.85) iterated until the
    * largest per-node change is ≤ `tolE12` units. Exact-equality
    * termination (tol = 0) is NOT offered: floor rounding can leave the
    * integer iteration cycling within a few units of the real fixpoint,
    * so a tolerance is the honest contract.
    *
    * With `rounds = Some(k)` the loop runs EXACTLY k damped rounds
    * (tolerance ignored, like [[ssspFixpoint]]'s bounded mode) — on a
    * symmetrized sink-free graph this is bit-identical to gr1's k-round
    * unrolled join formulation (every node has outdeg ≥ 1 and appears as
    * a dst, so the unroll's inner joins and this driver's
    * keep-all-nodes rounds rank the same node set; GraphFixpointSpec
    * pins it), which lets gr1 inherit the hybrid local finish.
    * @param edges DIRECTED edges; every node must have outdegree ≥ 1
    *              (the gr1 construction guarantees it by symmetrizing) */
  def pageRankFixpoint(edges: DataFrame, src: String, dst: String,
                       tolE12: Long = 1000L,
                       maxIters: Int = 500,
                       localThreshold: Long = localFinishEdges,
                       broadcastLimit: Long = broadcastNodeLimit,
                       rounds: Option[Int] = None): DataFrame = {
    val unit = 1000000000000L
    val dampBase = 150000000000L
    // bounded mode runs exactly k rounds: disable the tolerance stop
    // (maxDelta ≥ 0 can never be ≤ -1) so an early near-convergence on a
    // small corpus cannot change the k-round result
    val tol = if (rounds.isDefined) -1L else tolE12
    val e = edges.select(col(src).cast("long").as("a"),
      col(dst).cast("long").as("b"))
    val eRaw = e.persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = eRaw.count()
    val spark = edges.sparkSession

    if (nEdges <= localThreshold) {
      import spark.implicits._
      val out = eRaw.as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          // CSR-packed kernel. PageRank runs ~40-80 damped rounds to a
          // 1e-3 tolerance — far more than BFS/peel — so a hash-map
          // adjacency pays ~3 hash probes per edge per ROUND (measured
          // 17 s on a 1.1M-edge graph). Packing ids to dense ints once
          // turns each round into pure array arithmetic (~0.5 s there).
          // The arithmetic is unchanged: Long floor-div contributions,
          // integer damping — bit-identical to the distributed path.
          val es = it.toArray
          val n2i = scala.collection.mutable.LongMap.empty[Int]
          val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
          def idOf(x: Long): Int =
            n2i.getOrElseUpdate(x, { ids += x; ids.size - 1 })
          val m = es.length
          val srcId = new Array[Int](m)
          val dstId = new Array[Int](m)
          var i = 0
          while (i < m) {
            srcId(i) = idOf(es(i)._1); dstId(i) = idOf(es(i)._2); i += 1
          }
          val n = ids.size
          val outdeg = new Array[Long](n)
          val off = new Array[Int](n + 1)
          i = 0
          while (i < m) {
            outdeg(srcId(i)) += 1L; off(srcId(i) + 1) += 1; i += 1
          }
          i = 0
          while (i < n) { off(i + 1) += off(i); i += 1 }
          val tgt = new Array[Int](m)
          val pos = java.util.Arrays.copyOf(off, n)
          i = 0
          while (i < m) {
            val s = srcId(i); tgt(pos(s)) = dstId(i); pos(s) += 1; i += 1
          }
          // ranks exist only for outdeg>0 nodes (the distributed path's
          // deg-derived node set); outdeg-0 slots are never read or emitted
          var ranks = Array.fill(n)(unit)
          var next = new Array[Long](n)
          val sums = new Array[Long](n)
          var iter = 0
          var maxDelta = Long.MaxValue
          while (maxDelta > tol && !rounds.contains(iter)) {
            iter += 1
            if (rounds.isEmpty && iter > maxIters)
              throw new IllegalStateException(
                s"pageRankFixpoint did not converge in $maxIters rounds")
            java.util.Arrays.fill(sums, 0L)
            var u = 0
            while (u < n) {
              val d = outdeg(u)
              if (d > 0L) {
                val cpe = ranks(u) / d // all values positive
                var j = off(u)
                val end = off(u + 1)
                while (j < end) { sums(tgt(j)) += cpe; j += 1 }
              }
              u += 1
            }
            maxDelta = 0L
            var v = 0
            while (v < n) {
              if (outdeg(v) > 0L) {
                val nr = dampBase + (85L * sums(v)) / 100L
                val d = math.abs(nr - ranks(v))
                if (d > maxDelta) maxDelta = d
                next(v) = nr
              }
              v += 1
            }
            val t = ranks; ranks = next; next = t
          }
          val fr = ranks
          (0 until n).iterator.collect {
            case v if outdeg(v) > 0L => (ids(v), fr(v))
          }
        }
        .toDF("node", "rank_e12")
        .localCheckpoint()
      eRaw.unpersist()
      return out
    }

    // Same adaptive shape as [[ssspFixpoint]]: the rank vector is
    // node-sized, so when the node set is broadcastable the up-front
    // edge-table repartition is a wasted full exchange — the per-round
    // contribution join broadcasts `contrib` and streams the cached
    // edges where they sit. `deg` doubles as the exact node count.
    val deg = eRaw.groupBy("a").agg(count(lit(1)).as("outdeg"))
      .select(col("a").as("node"), col("outdeg"))
      .localCheckpoint()
    val bcastRanks = deg.count() <= broadcastLimit
    val eP =
      if (bcastRanks) eRaw
      else {
        val p = e.repartition(col("a")).persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        eRaw.unpersist()
        p
      }
    var ranks = deg.select(col("node"), lit(unit).as("r"))
      .localCheckpoint()
    var iter = 0
    var maxDelta = Long.MaxValue
    while (maxDelta > tol && !rounds.contains(iter)) {
      iter += 1
      if (rounds.isEmpty && iter > maxIters)
        throw new IllegalStateException(
          s"pageRankFixpoint did not converge in $maxIters rounds")
      val contrib = ranks.join(deg, "node")
        .select(col("node"), expr("r div outdeg").as("cpe"))
      val cSide = if (bcastRanks) broadcast(contrib) else contrib
      val sums = eP
        .join(cSide, eP("a") === cSide("node"))
        .groupBy(col("b"))
        .agg(sum(col("cpe")).as("sc"))
        .select(col("b").as("node"), col("sc"))
      // left-outer from the node set: a node with no in-edges keeps the
      // damping base (the local path's getOrElse(0) — paths must agree)
      val next = ranks.select(col("node"), col("r").as("old"))
        .join(sums, Seq("node"), "left_outer")
        .select(col("node"), col("old"),
          (lit(dampBase) +
            expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) div 100"))
            .as("nr"))
        .withColumn("_delta", abs(col("nr") - col("old")))
        .localCheckpoint()
      maxDelta = next.agg(max(col("_delta"))).head().getLong(0)
      release(ranks)
      ranks = next.select(col("node"), col("nr").as("r"))
    }
    eP.unpersist()
    val out = ranks.select(col("node"), col("r").as("rank_e12"))
    // `out` scans only the final ranks checkpoint, so the caller's
    // release(out) can never reach `deg`'s checkpoint blocks — free them
    // here or every invocation leaks one node-sized RDD (the same
    // discipline the loop applies to superseded rank tables).
    release(deg)
    out
  }

  /** Single-task k-core peel over a symmetrized boxed edge iterator —
    * the shared local kernel behind [[kCorePeel]] (`roundLimit` set) and
    * [[kCoreFixpoint]] (`roundLimit` = None, run until a round removes
    * nobody, `maxIters` throw). Dense-int packing + flat arrays: the
    * Set[Long]/boxed-tuple formulation it replaced went quadratic in GC
    * at ~14M edges (29 s vs ~3 s here); each round is two array sweeps
    * (degree count over alive edges, then the removal scan) — identical
    * batch semantics to the distributed rounds. */
  private def peelLocal(it: Iterator[(Long, Long)], k: Int,
                        roundLimit: Option[Int], maxIters: Int,
                        divergeMsg: String): Iterator[(Long, Long)] = {
    val es = it.toArray
    val n2i = scala.collection.mutable.LongMap.empty[Int]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def idOf(x: Long): Int =
      n2i.getOrElseUpdate(x, { ids += x; ids.size - 1 })
    val m = es.length
    val srcId = new Array[Int](m)
    val dstId = new Array[Int](m)
    var i = 0
    while (i < m) { srcId(i) = idOf(es(i)._1); dstId(i) = idOf(es(i)._2); i += 1 }
    val n = ids.size
    val alive = Array.fill(n)(true)
    val deg = new Array[Long](n)
    var nAlive = n.toLong
    def peelOneRound(): Long = {
      java.util.Arrays.fill(deg, 0L)
      var e = 0
      while (e < m) {
        if (alive(srcId(e)) && alive(dstId(e))) deg(srcId(e)) += 1L
        e += 1
      }
      var removed = 0L
      var v = 0
      while (v < n) {
        if (alive(v) && deg(v) < k) { alive(v) = false; removed += 1L }
        v += 1
      }
      nAlive -= removed
      removed
    }
    val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    roundLimit match {
      case Some(rs) =>
        var r = 1
        while (r <= rs) { res += ((r.toLong, peelOneRound())); r += 1 }
      case None =>
        var r = 0
        var removed = -1L
        while (removed != 0L) {
          r += 1
          if (r > maxIters) throw new IllegalStateException(divergeMsg)
          removed = peelOneRound()
          if (removed > 0L) res += ((r.toLong, removed))
        }
    }
    res += ((-1L, nAlive))
    res.iterator
  }

  /** Free the executor storage behind any localCheckpoint leaves in `df`'s
    * plan. The labels returned by [[connectedComponents]] are backed by a
    * checkpointed RDD whose blocks survive both `Dataset.unpersist()` and
    * `spark.catalog.clearCache()` (those only see CacheManager entries) —
    * callers should invoke this once the result has been consumed.
    * Safe on any DataFrame: non-checkpoint leaves are ignored. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
