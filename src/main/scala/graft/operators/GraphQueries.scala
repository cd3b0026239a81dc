package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Iterative graph analytics as oracle-checked queries — the query-level
  * face of the `operators/Graph` connected-components machinery that
  * powers d10/v11/m4.
  *
  * PageRank is float-hostile for cross-engine parity: per-node
  * contribution sums run in engine-chosen order and IEEE addition is not
  * associative. The engine's exactness rule (QueryPack.Exact) fixes it by
  * leaving floats out entirely: ranks are BIGINT in 1e-12 units,
  * per-edge contributions use floor division (`div` / `//` — exactly
  * specified, identical both engines), and the damping step is integer
  * `0.15e12 + (85·s) div 100`. Integer addition IS associative, so the
  * shuffle order of the contribution sum cannot change the result, on
  * this engine or any 1000-executor layout — the same property that
  * makes the sum safe to partial-aggregate map-side at 100 TB.
  */
object GraphQueries extends QueryPack {

  private val iters = 3
  private val unitE12 = 1000000000000L   // initial rank, 1e-12 units
  private val dampBaseE12 = 150000000000L // 0.15 in 1e-12 units

  // -- gr1: integer-scaled PageRank over the customer↔supplier graph
  //    (an edge per distinct trading pair from orders⋈lineitem, both
  //    directions, so every node has outdegree ≥ 1 and sinks cannot
  //    occur). Node ids share one BIGINT space: customer c → 2c,
  //    supplier s → 2s+1. Three unrolled iterations; top 20 by final
  //    rank with a total-order tiebreak. Scale shape: each iteration is
  //    one edges⋈ranks hash join plus one map-side-combinable integer
  //    sum on dst — textbook distributed PageRank, just with the float
  //    replaced by a deterministic integer.
  private val gr1PageRank: Q = (s, dir) => {
    val pairs = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
              (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    // no dedup needed: pairs is distinct and the two direction copies
    // cannot collide (customer nodes are even, supplier nodes odd), so
    // the union IS the edge set — one shuffle saved vs a distinct()
    val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
      .repartition(col("src"))
      .persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    var ranks = deg.select(col("src").as("node"), lit(unitE12).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(deg, ranks("node") === deg("src"))
        .select(col("node"), expr("r div outdeg").as("cpe"))
      ranks = edges
        .join(contrib, edges("src") === contrib("node"))
        .groupBy(col("dst"))
        .agg(sum(col("cpe")).as("sc"))
        .select(col("dst").as("node"),
          (lit(dampBaseE12) + expr("(85 * sc) div 100")).as("r"))
    }
    ranks
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_kind"),
        expr("node div 2").as("node_id"),
        col("r").as("rank_e12"))
      .orderBy(col("rank_e12").desc, col("node_kind"), col("node_id"))
      .limit(20)
  }

  private val gr1Sql = {
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, CAST(sum(r.r // d.outdeg) AS BIGINT) AS sc
         |  FROM edges e
         |  JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT node, $dampBaseE12 + (85 * sc) // 100 AS r FROM c$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT c AS src, p AS dst FROM pairs
       |  UNION ALL
       |  SELECT p AS src, c AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |r0 AS (SELECT src AS node, CAST($unitE12 AS BIGINT) AS r FROM deg),
       |$iterCtes
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |         AS node_kind,
       |       node // 2 AS node_id,
       |       r AS rank_e12
       |FROM r$iters
       |ORDER BY rank_e12 DESC, node_kind, node_id LIMIT 20""".stripMargin
  }

  def queries: Map[String, Q] = Map("gr1_pagerank" -> gr1PageRank)
  def oracles: Map[String, String] = Map("gr1_pagerank" -> gr1Sql)
}
