package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-native Lloyd's k-means over `array<float>` embeddings — the
  * IVF *training* stage (centroid set) feeding the v4 build / v6 search
  * pair. Deliberately plan-level, not MLlib: each iteration is
  *
  *   assign: corpus ⋈ broadcast(centroids) → argmin squared distance
  *           (one scan, k·dims flops per row, no shuffle of the corpus);
  *   update: groupBy(cell) of posexploded vectors → per-dim means
  *           (one shuffle on (cell, pos), map-side combined).
  *
  * Centroids are k·dims doubles — driver-safe for any realistic k; the
  * corpus is never collected. Initialization is deterministic (first k
  * distinct vec_ids by id order), so runs are reproducible.
  */
object KMeans {

  /** One row per (cell, pos) — the long-format centroid table. */
  def fit(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val corpus = embeddings.select("vec_id", "embedding")

    // deterministic seed: the k lowest vec_ids
    var centroids = corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("int").as("cell"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cell"), col("pos"),
        col("v").cast("double").as("mean_v"))
      .groupBy("cell", "pos").agg(first(col("mean_v")).as("mean_v"))
    // re-number cells 0..k-1 for stability. The distinct seed ids are k
    // ints (dimension-sized — k ∝ √n stays driver-safe at any corpus
    // scale), so the id map is collected and broadcast-joined back; a
    // dense_rank over an unpartitioned window would do the same job but
    // drags every row to one partition and trips the global-window
    // warning, so it is banned here like everywhere else in the engine.
    import spark.implicits._
    val idMap = centroids.select("cell").distinct().orderBy("cell")
      .collect().map(_.getInt(0)).zipWithIndex.toSeq
      .toDF("cell", "cell_new")
    centroids = centroids.join(broadcast(idMap), "cell")
      .select(col("cell_new").as("cell"), col("pos"), col("mean_v"))

    // Each iteration persists its centroids to cut lineage growth; the
    // previous iteration's cache is released once the new one is
    // materialized. The RETURNED frame stays persisted — callers that are
    // done with it should unpersist().
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val assigned = assign(corpus, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(avg(col("v").cast("double")).as("mean_v"))
      centroids.persist()
      centroids.count()
      prev.foreach(_.unpersist())
      prev = Some(centroids)
    }
    centroids
  }

  /** [[fit]] generalized to MANY independent trainings in one plan:
    * `sub` carries a `subspace` column and every subspace trains its own
    * k centroids simultaneously — each Lloyd iteration is ONE update
    * shuffle keyed (subspace, cell, pos) instead of a sequential fit per
    * subspace (v12/IvfPqIndex build: 4 PQ codebooks, one plan, one
    * shuffle per round — the difference between 4 serialized stage
    * chains and 1 at cluster scale). Per-subspace arithmetic — seeds,
    * argmin, means — is IDENTICAL to running fit() on that subspace
    * alone, so results are bit-equal to the sequential loop and the
    * unrolled oracle replay. */
  def fitGrouped(sub: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = sub.sparkSession
    val corpus = sub.select("subspace", "vec_id", "embedding")

    // deterministic seed: the k lowest vec_ids of each subspace
    var centroids = graft.plans.GroupedTopK
      .topK(corpus, Seq("subspace"), k, col("vec_id").asc)
      .select(col("subspace"), col("vec_id").cast("int").as("cell"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("subspace"), col("cell"), col("pos"),
        col("v").cast("double").as("mean_v"))
      .groupBy("subspace", "cell", "pos").agg(first(col("mean_v")).as("mean_v"))
    // re-number cells 0..k-1 within each subspace (same id-order rule as
    // fit; the map is subspaces·k ints — dimension-sized at any scale)
    import spark.implicits._
    val idMap = centroids.select("subspace", "cell").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      .groupBy(_._1).toSeq.flatMap { case (ss, cs) =>
        cs.map(_._2).sorted.zipWithIndex.map { case (c, i) => (ss, c, i) }
      }.toDF("subspace", "cell", "cell_new")
    centroids = centroids.join(broadcast(idMap), Seq("subspace", "cell"))
      .select(col("subspace"), col("cell_new").as("cell"), col("pos"),
        col("mean_v"))

    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val assigned = assignGrouped(corpus, centroids)
      centroids = assigned
        .select(col("subspace"), col("cell"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("subspace", "cell", "pos")
        .agg(avg(col("v").cast("double")).as("mean_v"))
      centroids.persist()
      centroids.count()
      prev.foreach(_.unpersist())
      prev = Some(centroids)
    }
    centroids
  }

  /** Per-subspace nearest-centroid assignment against [[fitGrouped]]'s
    * long centroid table: the broadcast equi-join on `subspace` replaces
    * assign's crossJoin, everything else is the same scoring/argmin. */
  def assignGrouped(sub: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids
      .groupBy("subspace", "cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_v"))))
        .as("pv"))
      .select(col("subspace"), col("cell"),
        expr("transform(pv, x -> CAST(x.mean_v AS FLOAT))").as("centroid"))
      .withColumn("cnorm2", DotProduct.dot(col("centroid"), col("centroid")))
    val scored = sub.join(broadcast(cents), "subspace")
      .withColumn("score",
        col("cnorm2") - lit(2.0) * DotProduct.dot(col("embedding"), col("centroid")))
    graft.plans.GroupedTopK.topK(scored, Seq("subspace", "vec_id"), 1,
        col("score").asc, col("cell").asc)
      .drop("score", "centroid", "cnorm2")
  }

  /** Nearest-centroid assignment: adds a `cell` column. The centroid table
    * pivots to dense arrays and broadcasts; distance is ‖e‖²-free argmin
    * over −2·e·c + ‖c‖² (monotone-equivalent, one dot per cell). The
    * argmin runs through GroupedTopK(k=1): the broadcast join keeps all k
    * scored rows of a vector in one partition, so the partial heap
    * reduces them to ONE row before the exchange — a window would
    * shuffle+sort the full n·k score table. */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    assignTopN(embeddings, centroids, 1)

  /** The `nprobe` generalization: each vector gets its `n` nearest cells
    * (one row per (vector, probed cell)) — n = 1 is the inverted-list
    * build; n > 1 is the IVF query-side probe that recovers the recall a
    * single probe loses at cell boundaries. */
  def assignTopN(embeddings: DataFrame, centroids: DataFrame, n: Int): DataFrame = {
    val cents = centroids
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_v"))))
        .as("pv"))
      .select(col("cell"),
        expr("transform(pv, x -> CAST(x.mean_v AS FLOAT))").as("centroid"))
      .withColumn("cnorm2", DotProduct.dot(col("centroid"), col("centroid")))
    val scored = embeddings.crossJoin(broadcast(cents))
      .withColumn("score",
        col("cnorm2") - lit(2.0) * DotProduct.dot(col("embedding"), col("centroid")))
    graft.plans.GroupedTopK.topK(scored, Seq("vec_id"), n,
        col("score").asc, col("cell").asc)
      .drop("score", "centroid", "cnorm2")
  }

  /** Within-cluster sum of squared distances — the convergence metric. */
  def cost(embeddings: DataFrame, centroids: DataFrame): Double = {
    val assigned = assign(embeddings, centroids)
    val cents = centroids.groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_v"))))
        .as("pv"))
      .select(col("cell"),
        expr("transform(pv, x -> CAST(x.mean_v AS FLOAT))").as("centroid"))
    assigned.join(broadcast(cents), "cell")
      .withColumn("d2",
        DotProduct.dot(col("embedding"), col("embedding")) -
        lit(2.0) * DotProduct.dot(col("embedding"), col("centroid")) +
        DotProduct.dot(col("centroid"), col("centroid")))
      .agg(sum(col("d2"))).collect()(0).getDouble(0)
  }
}
