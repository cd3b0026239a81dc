package graft.operators

import graft.{QueryPack, Tables}
import graft.sources.MergeWriter
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Merge-upsert (S5) and streaming-shaped window aggregations (§2.9) as
  * oracle-checked batch queries. The same `EventStream` transforms run
  * under `readStream` in StreamingSpec — batch/stream parity is the point.
  */
object MergeStream extends QueryPack {

  // -- s5: upsert by natural key. Base = orders before 1998; updates =
  //    re-statements of half the 1998+ orders (price bumped) plus the
  //    other half as genuinely new keys. Anti-join + union, one shuffle.
  private val s5MergeUpsert: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val base = o.filter(col("o_orderkey") % 4 =!= 0)
    val updates = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("o_orderstatus", lit("U"))
    MergeWriter.merge(base, updates, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  private val s5Sql =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 4 <> 0),
      |updates AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
      |FROM base b WHERE NOT EXISTS
      |  (SELECT 1 FROM updates u WHERE u.o_orderkey = b.o_orderkey)
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
      |ORDER BY o_orderkey""".stripMargin

  // -- st1: tumbling 1-hour windowed counts per event type.
  private val st1Tumbling: Q = (s, dir) =>
    EventStream.tumblingCounts(Tables.events(s, dir))
      .orderBy("window_start", "event_type")

  private val st1Sql =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // -- st2: native session_window — must agree with the hand-rolled
  //    lag/gap sessionization (a5) computed in the oracle. The Spark gap
  //    is 30 min + 1 ms (see EventStream.sessionWindows) so the split
  //    rule is exactly `gap > 1800000 ms` on both sides; the oracle's
  //    session_end carries the same +1 ms.
  private val st2Session: Q = (s, dir) =>
    EventStream.sessionWindows(Tables.events(s, dir))
      .orderBy("user_id", "session_start")

  private val st2Sql =
    """WITH g AS (
      |  SELECT user_id, ts,
      |         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000
      |                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL '1800001 milliseconds' AS session_end,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  def queries: Map[String, Q] = Map(
    "s5_merge_upsert"    -> s5MergeUpsert,
    "st1_tumbling_window" -> st1Tumbling,
    "st2_session_window" -> st2Session)

  def oracles: Map[String, String] = Map(
    "s5_merge_upsert"    -> s5Sql,
    "st1_tumbling_window" -> st1Sql,
    "st2_session_window" -> st2Sql)
}
