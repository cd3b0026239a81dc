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

  // -- w5: as-of join, self form — attach to every event the time of the
  //    user's latest STRICTLY-PRIOR 'click'. Spark has no native as-of
  //    join; the union/backfill trick is unnecessary when the probe and
  //    build sides share a partition key: one window over (user, time)
  //    with an UNBOUNDED..−1 frame and last(..., ignoreNulls) is the
  //    whole operator — a single shuffle on user_id, no join at all.
  //    Ordering runs on epoch-millis BIGINT on BOTH engines (corpus
  //    generations have shipped ts at different precisions — see
  //    Tables.events — so ordering by the raw column could disagree on
  //    sub-ms neighbors), with event_id as the total tie-break.
  private val w5AsofPrior: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("prior_click_ms",
        last(when(col("event_type") === "click", col("ts_ms")),
          ignoreNulls = true).over(w))
      .select("event_id", "user_id", "ts_ms", "prior_click_ms")
      .orderBy("event_id")
  }

  private val w5Sql =
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      |       last_value(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END IGNORE NULLS)
      |         OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_ms
      |FROM events ORDER BY event_id""".stripMargin

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

  // -- st3: hopping windows (batch face of EventStream.hoppingCounts).
  //    The oracle replays Spark's window assignment: with window = 2 ×
  //    slide, every event belongs to exactly its 5-minute bucket and the
  //    one before it; time_bucket's 2000-01-01 origin is a whole multiple
  //    of 5 minutes from the epoch, so the alignment is identical.
  private val st3Hopping: Q = (s, dir) =>
    EventStream.hoppingCounts(Tables.events(s, dir))
      .orderBy("window_start", "event_type")

  private val st3Sql =
    """WITH e AS (
      |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS s0, event_type,
      |         CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |x AS (
      |  SELECT s0 AS window_start, event_type, v FROM e
      |  UNION ALL
      |  SELECT s0 - INTERVAL '5 minutes' AS window_start, event_type, v FROM e)
      |SELECT window_start, event_type, count(*) AS n,
      |       CAST(sum(v) AS DOUBLE) AS sum_value
      |FROM x GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  // -- st4: the interval join (batch face of EventStream.attributeClicks
  //    — the click-attribution stream-stream join; StreamingSpec drives
  //    the same plan as two watermarked streams). Here: each 'view'
  //    matched to the same user's clicks within the next 30 minutes.
  //    Timestamps are truncated to millis on BOTH engines before the
  //    range predicate (w5's trick): corpus generations have shipped ts
  //    at different precisions (see Tables.events), and a boundary
  //    comparison on mixed precision could disagree on sub-microsecond
  //    neighbors.
  private val st4Interval: Q = (s, dir) => {
    val e = Tables.events(s, dir)
    def ms(c: org.apache.spark.sql.Column) = timestamp_millis(unix_millis(c))
    val imps = e.filter(col("event_type") === "view").select(
      col("event_id").as("imp_event"), col("user_id").as("imp_id"),
      ms(col("ts")).as("imp_ts"))
    val clicks = e.filter(col("event_type") === "click").select(
      col("event_id").as("click_event"), col("user_id").as("click_imp_id"),
      ms(col("ts")).as("click_ts"))
    EventStream.attributeClicks(imps, clicks, "10 minutes", "30 minutes")
      .select("imp_event", "click_event", "imp_ts", "click_ts")
      .orderBy("imp_event", "click_event")
  }

  private val st4Sql =
    """WITH i AS (
      |  SELECT event_id AS imp_event, user_id AS imp_id,
      |         make_timestamp(epoch_ms(ts)*1000) AS imp_ts
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT event_id AS click_event, user_id AS cuser,
      |         make_timestamp(epoch_ms(ts)*1000) AS click_ts
      |  FROM events WHERE event_type = 'click')
      |SELECT imp_event, click_event, imp_ts, click_ts
      |FROM i JOIN c ON imp_id = cuser
      | AND click_ts >= imp_ts
      | AND click_ts <= imp_ts + INTERVAL '30 minutes'
      |ORDER BY imp_event, click_event""".stripMargin

  // -- st5: the custom-state operator itself — EventStream.userProfiles'
  //    flatMapGroupsWithState run in BATCH mode (Spark executes the same
  //    keyed-state function over each group with empty initial state), so
  //    the oracle checks the exact operator the stream runs, not a
  //    re-derivation. Values feed in as integer CENTS carried in doubles:
  //    integer-valued double addition is associative below 2^53, so the
  //    per-group accumulation order (which batch grouping does not
  //    define) cannot change the total — the same trick that makes gr1's
  //    PageRank shuffle-order-proof. State partitions by user_id: at
  //    100 TB the state store scales with distinct keys, not events.
  private val st5UserProfile: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        round(col("value") * 100).cast("double").as("cents"))
      .as[(Long, Long, Double)]
    EventStream.userProfiles(e).toDF()
      .select(col("userId").as("user_id"), col("nEvents").as("n_events"),
        col("totalValue").cast("long").as("total_cents"),
        col("lastTsMs").as("last_ts_ms"))
      .orderBy("user_id")
  }

  private val st5Sql =
    """SELECT user_id, count(*) AS n_events,
      |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents,
      |       max(epoch_ms(ts)) AS last_ts_ms
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  def queries: Map[String, Q] = Map(
    "s5_merge_upsert"    -> s5MergeUpsert,
    "w5_asof_prior"      -> w5AsofPrior,
    "st1_tumbling_window" -> st1Tumbling,
    "st2_session_window" -> st2Session,
    "st3_hopping_window" -> st3Hopping,
    "st4_interval_join"  -> st4Interval,
    "st5_user_profile"   -> st5UserProfile)

  def oracles: Map[String, String] = Map(
    "s5_merge_upsert"    -> s5Sql,
    "w5_asof_prior"      -> w5Sql,
    "st1_tumbling_window" -> st1Sql,
    "st2_session_window" -> st2Sql,
    "st3_hopping_window" -> st3Sql,
    "st4_interval_join"  -> st4Sql,
    "st5_user_profile"   -> st5Sql)
}
