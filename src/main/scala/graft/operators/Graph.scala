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
    * overhead vs ~0.2 s for the single-task union-find). 2M edges ≈
    * 32 MB of longs — comfortably one task, far below executor memory. */
  private val localFinishEdges = 2000000L

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
        .mapPartitions { it =>
          var es = it.toArray
          var nodes = es.iterator.map(_._1).toSet
          val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          for (r <- 1 to rounds) {
            val deg = scala.collection.mutable.LongMap.empty[Long]
            es.foreach { case (a, _) => deg(a) = deg.getOrElse(a, 0L) + 1L }
            val kept = nodes.filter(n => deg.getOrElse(n, 0L) >= k)
            res += ((r.toLong, (nodes.size - kept.size).toLong))
            es = es.filter(e => kept(e._1) && kept(e._2))
            nodes = kept
          }
          res += ((-1L, nodes.size.toLong))
          res.iterator
        }
        .toDF("round", "n_nodes")
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
