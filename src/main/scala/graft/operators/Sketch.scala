package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Distinct-count sketching (the approx-aggregation family a training-data
  * pipeline leans on for cardinality telemetry at 100 TB).
  *
  * `approx_count_distinct` (HyperLogLog++) is the usual Spark answer, but
  * its register layout is implementation-private — no other engine can
  * replay it, so it can only ever get a rows-only check. A K-minimum-values
  * (KMV) sketch over a cross-engine hash (md5) has the same one-pass /
  * mergeable / bounded-state scale shape, a knowable error bound
  * (≈ 1/√(k−2)), AND a deterministic value — so the oracle check is exact,
  * which is the whole game here (see graft-bit-stability rules).
  *
  * Scale shape: the sketch state per group is the k smallest distinct
  * hashes — GroupedTopK's partial→exchange→final pipeline keeps the
  * exchange at k rows per group regardless of corpus size, exactly how a
  * distributed KMV union works on a real cluster.
  */
object Sketch extends QueryPack {

  private val K = 32

  // -- k1: estimated vs exact distinct users per event type. h = first 15
  //    hex digits of md5 → uniform in [0, 2^60); the (k−1)/max-of-k-min
  //    estimator on distinct hashes. Groups with fewer than K distinct
  //    hashes report the sketch cardinality itself (the sketch is exact
  //    below its capacity). n_exact rides along to make the query double
  //    as an accuracy report.
  private val k1KmvDistinct: Q = (s, dir) => {
    val du = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("h",
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
    val dh = du.select("event_type", "h").distinct()
    val kth = graft.plans.GroupedTopK.topK(dh, Seq("event_type"), K, col("h").asc)
      .groupBy("event_type")
      .agg(max(col("h")).as("hk"), count(lit(1)).as("m"))
    val exact = du.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(kth, "event_type")
      .select(col("event_type"), col("n_exact"),
        when(col("m") >= K,
          lit((K - 1).toDouble) * lit(1152921504606846976.0) /
            col("hk").cast("double"))
          .otherwise(col("m").cast("double")).as("est_distinct"))
      .orderBy("event_type")
  }

  // The oracle parses the same 15 hex digits positionally (DuckDB has no
  // base-conversion builtin); shifts keep it exact BIGINT arithmetic.
  private val k1Sql =
    s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
       |hx AS (
       |  SELECT event_type,
       |         list_sum(list_transform(range(0, 15), i ->
       |           CAST(strpos('0123456789abcdef',
       |                substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT) + 1, 1)) - 1 AS BIGINT)
       |             * (CAST(1 AS BIGINT) << CAST(4 * (14 - i) AS INT)))) AS h
       |  FROM du),
       |dh AS (SELECT DISTINCT event_type, h FROM hx),
       |rk AS (SELECT event_type, h,
       |              row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
       |       FROM dh),
       |kth AS (SELECT event_type, max(h) AS hk, count(*) AS m
       |        FROM rk WHERE r <= $K GROUP BY event_type),
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
       |       FROM events GROUP BY event_type)
       |SELECT ex.event_type, ex.n_exact,
       |       CASE WHEN m >= $K
       |            THEN ${K - 1}.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)
       |            ELSE CAST(m AS DOUBLE) END AS est_distinct
       |FROM ex JOIN kth ON ex.event_type = kth.event_type
       |ORDER BY ex.event_type""".stripMargin

  def queries: Map[String, Q] = Map(
    "k1_kmv_distinct" -> k1KmvDistinct)

  def oracles: Map[String, String] = Map(
    "k1_kmv_distinct" -> k1Sql)
}
