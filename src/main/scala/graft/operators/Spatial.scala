package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial joins and cross-pipeline comparison (SURVEY.md §2.3 J5/J8,
  * §2.4 A13) expressed on the corpus.
  *
  * J5 is the reference's point-in-polygon footprint join
  * (run_image_extraction.py:632-644, matplotlib Path.contains_points):
  * here a broadcast quad table against a synthetic point cloud, bounding
  * -box prefilter + 4 half-plane cross-product tests — no UDF, all
  * codegen'd comparisons. A13 is the aperture-photometry shape
  * (run_image_extraction.py:502-568): a distance-predicate (range) join
  * of points to aperture centers, then a grouped flux sum per (center,
  * radius). J8 is the IDL-vs-Python comparison join
  * (compare_idl_python.py:411-502): align two pipeline variants on a key
  * and compare measures.
  */
object Spatial extends QueryPack {

  /** Synthetic deterministic point cloud from customer: x,y ∈ [0,100). */
  private def points(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.customer(s, dir).select(
      col("c_custkey").as("pid"),
      (col("c_custkey") % 100).cast("double").as("x"),
      ((col("c_custkey") * 37 + 11) % 100).cast("double").as("y"),
      col("c_acctbal").as("val"))

  private val pointsSql =
    """SELECT c_custkey AS pid,
      |       CAST(c_custkey % 100 AS DOUBLE) AS x,
      |       CAST((c_custkey * 37 + 11) % 100 AS DOUBLE) AS y,
      |       c_acctbal AS val
      |FROM customer""".stripMargin

  // -- j5: point-in-polygon — two convex quads (one axis-aligned, one
  //    rotated), CCW corners; inside = all 4 cross products ≥ 0.
  private val quads: Seq[(String, Seq[(Double, Double)])] = Seq(
    ("q_box",     Seq((10.0, 10.0), (40.0, 10.0), (40.0, 40.0), (10.0, 40.0))),
    ("q_diamond", Seq((60.0, 30.0), (90.0, 60.0), (60.0, 90.0), (30.0, 60.0))))

  private val j5PointInPolygon: Q = (s, dir) => {
    import s.implicits._
    val quadDf = quads.map { case (q, cs) =>
      (q, cs(0)._1, cs(0)._2, cs(1)._1, cs(1)._2,
          cs(2)._1, cs(2)._2, cs(3)._1, cs(3)._2)
    }.toDF("quad", "x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4")

    def cross(xa: Column, ya: Column, xb: Column, yb: Column): Column =
      (xb - xa) * (col("y") - ya) - (yb - ya) * (col("x") - xa)

    val inside =
      cross(col("x1"), col("y1"), col("x2"), col("y2")) >= 0 &&
      cross(col("x2"), col("y2"), col("x3"), col("y3")) >= 0 &&
      cross(col("x3"), col("y3"), col("x4"), col("y4")) >= 0 &&
      cross(col("x4"), col("y4"), col("x1"), col("y1")) >= 0

    val bbox =
      col("x") >= least(col("x1"), col("x2"), col("x3"), col("x4")) &&
      col("x") <= greatest(col("x1"), col("x2"), col("x3"), col("x4")) &&
      col("y") >= least(col("y1"), col("y2"), col("y3"), col("y4")) &&
      col("y") <= greatest(col("y1"), col("y2"), col("y3"), col("y4"))

    points(s, dir).join(broadcast(quadDf), bbox && inside)
      .groupBy("quad")
      .agg(count(lit(1)).as("n_inside"),
           sum(graft.Exact.dec2(col("val"))).cast("double").as("sum_val"))
      .orderBy("quad")
  }

  private val j5Sql = {
    val quadRows = quads.map { case (q, cs) =>
      s"('$q', ${cs.map { case (x, y) => s"$x, $y" }.mkString(", ")})"
    }.mkString(",\n  ")
    s"""WITH p AS ($pointsSql),
       |q(quad, x1, y1, x2, y2, x3, y3, x4, y4) AS (VALUES
       |  $quadRows),
       |j AS (
       |  SELECT q.quad, p.val FROM p JOIN q ON
       |    p.x >= least(x1, x2, x3, x4) AND p.x <= greatest(x1, x2, x3, x4) AND
       |    p.y >= least(y1, y2, y3, y4) AND p.y <= greatest(y1, y2, y3, y4) AND
       |    (x2 - x1)*(p.y - y1) - (y2 - y1)*(p.x - x1) >= 0 AND
       |    (x3 - x2)*(p.y - y2) - (y3 - y2)*(p.x - x2) >= 0 AND
       |    (x4 - x3)*(p.y - y3) - (y4 - y3)*(p.x - x3) >= 0 AND
       |    (x1 - x4)*(p.y - y4) - (y1 - y4)*(p.x - x4) >= 0)
       |SELECT quad, count(*) AS n_inside,
       |       CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
       |FROM j GROUP BY quad ORDER BY quad""".stripMargin
  }

  // -- a13: aperture sum — points within radius r of each center, flux
  //    sum per (center, radius); the (x−xc)²+(y−yc)² ≤ r² range join with
  //    the center×radius table broadcast.
  private val centers = Seq((1, 25.0, 25.0), (2, 50.0, 50.0), (3, 75.0, 75.0))
  private val radii = Seq(5.0, 10.0, 20.0)

  private val a13ApertureSum: Q = (s, dir) => {
    import s.implicits._
    val apDf = (for ((cid, cx, cy) <- centers; r <- radii)
      yield (cid, cx, cy, r)).toDF("center_id", "cx", "cy", "r")
    val dist2 = (col("x") - col("cx")) * (col("x") - col("cx")) +
                (col("y") - col("cy")) * (col("y") - col("cy"))
    points(s, dir).join(broadcast(apDf), dist2 <= col("r") * col("r"))
      .groupBy("center_id", "r")
      .agg(count(lit(1)).as("n_points"),
           sum(graft.Exact.dec2(col("val"))).cast("double").as("aperture_sum"))
      .orderBy("center_id", "r")
  }

  private val a13Sql = {
    val apRows = (for ((cid, cx, cy) <- centers; r <- radii)
      yield s"($cid, $cx, $cy, $r)").mkString(",\n  ")
    s"""WITH p AS ($pointsSql),
       |ap(center_id, cx, cy, r) AS (VALUES
       |  $apRows)
       |-- CAST on r: the VALUES literals type as DECIMAL(3,1) in DuckDB
       |-- while Spark's Seq[Double] column is DOUBLE; typed hash must agree.
       |SELECT center_id, CAST(r AS DOUBLE) AS r, count(*) AS n_points,
       |       CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS aperture_sum
       |FROM p JOIN ap
       |  ON (p.x - cx)*(p.x - cx) + (p.y - cy)*(p.y - cy) <= r*r
       |GROUP BY center_id, r ORDER BY center_id, r""".stripMargin
  }

  // -- j8: two-pipeline comparison — the corrected (ctecorr-style) vs
  //    uncorrected variants aligned on a key: here odd- vs even-linenumber
  //    "pipelines" per (returnflag, year), comparing mean prices and the
  //    recovered fraction (compare_idl_python.py:373-391 analog).
  private val j8PipelineCompare: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select(
      col("l_returnflag"), year(col("l_shipdate")).as("yr"),
      (col("l_linenumber") % 2).as("pipe"),
      graft.Exact.dec2(col("l_extendedprice")).as("p"))
    def side(v: Int, n: String, m: String) =
      li.filter(col("pipe") === v)
        .groupBy("l_returnflag", "yr")
        .agg(count(lit(1)).as(n),
             (sum(col("p")).cast("double") / count(lit(1))).as(m))
    side(1, "n_a", "mean_a")
      .join(side(0, "n_b", "mean_b"), Seq("l_returnflag", "yr"))
      .withColumn("mean_ratio", col("mean_a") / col("mean_b"))
      .withColumn("frac_recovered",
        lit(100.0) * (lit(1.0) -
          (col("n_a") - col("n_b")).cast("double") / col("n_a").cast("double")))
      .orderBy("l_returnflag", "yr")
  }

  private val j8Sql =
    """WITH li AS (
      |  SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS yr,
      |         l_linenumber % 2 AS pipe,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS p
      |  FROM lineitem),
      |a AS (SELECT l_returnflag, yr, count(*) AS n_a,
      |             CAST(sum(p) AS DOUBLE)/count(*) AS mean_a
      |      FROM li WHERE pipe = 1 GROUP BY 1, 2),
      |b AS (SELECT l_returnflag, yr, count(*) AS n_b,
      |             CAST(sum(p) AS DOUBLE)/count(*) AS mean_b
      |      FROM li WHERE pipe = 0 GROUP BY 1, 2)
      |SELECT a.l_returnflag, a.yr, a.n_a, a.mean_a, b.n_b, b.mean_b,
      |       a.mean_a / b.mean_b AS mean_ratio,
      |       100.0 * (1.0 - CAST(a.n_a - b.n_b AS DOUBLE)/CAST(a.n_a AS DOUBLE)) AS frac_recovered
      |FROM a JOIN b USING (l_returnflag, yr)
      |ORDER BY l_returnflag, yr""".stripMargin

  def queries: Map[String, Q] = Map(
    "j5_point_in_polygon" -> j5PointInPolygon,
    "a13_aperture_sum"    -> a13ApertureSum,
    "j8_pipeline_compare" -> j8PipelineCompare)

  def oracles: Map[String, String] = Map(
    "j5_point_in_polygon" -> j5Sql,
    "a13_aperture_sum"    -> a13Sql,
    "j8_pipeline_compare" -> j8Sql)
}
