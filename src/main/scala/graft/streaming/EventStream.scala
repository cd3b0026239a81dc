package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming event transforms (SURVEY.md §2.9 — the reference
  * is pure batch; this is the extension path for its incremental
  * `--pr 'last'` re-ingestion pattern).
  *
  * Each transform is written against a plain DataFrame so the *same code*
  * runs in batch (for the DuckDB oracle) and on a `readStream` source (for
  * the streaming spec): the Structured Streaming contract — batch and
  * stream share one logical plan.
  */
object EventStream {

  /** Tumbling 1-hour counts/sums per event type. In streaming mode add
    * `.withWatermark("ts", …)` upstream; state then evicts as the
    * watermark passes each window end. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(graft.Exact.dec2(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Hopping (sliding) 10-minute windows every 5 minutes: each event
    * lands in exactly window/slide = 2 windows. Spark expands the rows
    * BEFORE the aggregate, so the shuffle carries 2× rows collapsed
    * map-side to |windows|×|types| partials — state in streaming mode is
    * bounded by the watermark horizon, not the stream length. Window
    * starts are epoch-aligned 5-minute marks (whole seconds), so the
    * start timestamp is representation-safe across engines. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(graft.Exact.dec2(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Streaming exact dedup bounded by the watermark — the streaming face
    * of the d1 batch dedup: re-delivered events (same natural key) inside
    * the watermark horizon are dropped, and key state older than the
    * horizon is EVICTED, so the state store is sized by the horizon and
    * the key arrival rate, never by stream lifetime. (Unbounded
    * `dropDuplicates` on a stream leaks state forever — the classic
    * production OOM.) A key re-delivered after its state aged out is
    * emitted again: the horizon is the dedup contract, pick it from the
    * source's real re-delivery window. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           eventTime: String, horizon: String): DataFrame =
    events
      .withWatermark(eventTime, horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream–static enrichment: left-join the event stream against a
    * (small) dimension table. The static side carries no watermark and no
    * state — Spark re-plans it into each micro-batch, and because the
    * dimension is dimension-sized the join broadcasts: events never
    * shuffle for the lookup. This is the production "attach user segment
    * to every event" pattern; the batch face is an ordinary broadcast
    * join, so the same call serves the oracle path. Unmatched events
    * survive (left join) — an enrichment must never drop traffic because
    * the dimension lags. */
  def enrichWithDimension(events: DataFrame, dim: DataFrame,
                          key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Per-user running profile for the custom-state operator. */
  case class UserProfile(userId: Long, nEvents: Long, totalValue: Double,
                         lastTsMs: Long)

  /** Custom keyed state via `flatMapGroupsWithState`: a per-user profile
    * (event count, value total, last-seen time) maintained ACROSS
    * micro-batches — the state primitive that windowed aggregations can't
    * express (arbitrary per-key accumulators, custom eviction). State is
    * partitioned by user_id, so it scales horizontally with keys; pair
    * with a timeout in production to bound the state store. Update mode:
    * each batch emits the keys it touched with their new totals. */
  def userProfiles(events: Dataset[(Long, Long, Double)])
      : Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[UserProfile, UserProfile](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[UserProfile]) =>
          val prev = state.getOption
            .getOrElse(UserProfile(userId, 0L, 0.0, Long.MinValue))
          var n = prev.nEvents
          var tot = prev.totalValue
          var last = prev.lastTsMs
          rows.foreach { case (_, tsMs, v) =>
            n += 1; tot += v; if (tsMs > last) last = tsMs
          }
          val next = UserProfile(userId, n, tot, last)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Incremental-ingest sink: each micro-batch merges into a parquet
    * table by natural key via `foreachBatch` + MergeWriter — the
    * streaming form of the reference's `--pr 'last'` re-ingestion
    * (README.md:498-521): re-delivered or re-stated rows upsert
    * idempotently instead of duplicating. Returns the started query. */
  def upsertStream(events: DataFrame, tablePath: String,
                   keys: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Within one micro-batch the winner per key must be deterministic
        // (dropDuplicates keeps an arbitrary row), and it should be the
        // LATEST event, matching the reference's last-statement-wins
        // upsert: order by the event-time column(s) first, then the
        // remaining non-key columns as a deterministic tie-break.
        val nonKey = batch.columns.filterNot(keys.contains).toSeq
        val dedup =
          if (nonKey.isEmpty) {
            // every column is a key ⇒ same-key rows are identical; an
            // ordered window over zero columns would throw.
            batch.dropDuplicates(keys)
          } else {
            val isEventTime = batch.schema.fields.filter { f =>
              nonKey.contains(f.name) && (f.dataType match {
                case _: org.apache.spark.sql.types.TimestampType => true
                case _: org.apache.spark.sql.types.TimestampNTZType => true
                case _ => f.name == "ts" || f.name.endsWith("_ts") ||
                  f.name.endsWith("ts_ms")
              })
            }.map(_.name).toSeq
            val ordering = (isEventTime ++ nonKey.filterNot(isEventTime.contains))
              .map(c => col(c).desc_nulls_last)
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(col): _*)
              .orderBy(ordering: _*)
            batch.withColumn("_rn", row_number().over(w))
              .filter(col("_rn") === 1).drop("_rn")
          }
        graft.sources.MergeWriter.upsertParquet(
          batch.sparkSession, tablePath, dedup, keys)
      }
      .start()

  /** Stream-stream interval join (the click-attribution shape): each
    * click row matches the impression with the same id whose event time
    * precedes it by at most `horizon`. This is the one streaming join
    * where BOTH sides buffer state; the two watermarks plus the
    * time-range predicate are what let Spark bound how long an
    * impression can still receive a matching click (≈ horizon + the
    * click watermark) and EVICT its state — a bare equi-join of two
    * streams would hold both sides forever. The same plan runs in batch
    * mode (watermarks are no-ops there) for the spec's cross-check. */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      watermark: String, horizon: String): DataFrame =
    impressions.withWatermark("imp_ts", watermark)
      .join(clicks.withWatermark("click_ts", watermark),
        expr("imp_id = click_imp_id AND click_ts >= imp_ts" +
          s" AND click_ts <= imp_ts + interval '$horizon'"))

  /** Gap-based sessions per user via native `session_window` — the
    * streaming-native form of the a5 sessionization. The gap is 30 min
    * PLUS 1 ms: Spark's session window is end-exclusive (an event exactly
    * `gap` after the last one starts a NEW session) while a5 and the st2
    * oracle split only when the gap EXCEEDS 30 min — the extra
    * millisecond makes the two rules agree at the exact boundary. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "1800001 milliseconds").as("w"),
               col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("w.end").as("session_end"), col("n_events"))
}
