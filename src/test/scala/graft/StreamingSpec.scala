package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The Structured-Streaming contract: the same EventStream transforms that
  * the batch oracle checks must produce identical results when run from a
  * `readStream` file source. */
class StreamingSpec extends SparkSpecBase {

  private def streamedEvents() = {
    // Stage the events parquet in a landing dir (file-stream source needs a
    // directory), with the nanos→micros conversion Tables.events applies.
    val landing = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(landing.toString).schema
    val raw = spark.readStream
      .schema(rawSchema)
      .parquet(landing.toString)
    rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  test("streamed tumbling-window counts equal the batch result") {
    val batch = EventStream.tumblingCounts(Tables.events(spark, sfDir))
      .orderBy("window_start", "event_type").collect().toSeq

    val q = EventStream.tumblingCounts(
        streamedEvents().withWatermark("ts", "1 hour"))
      .writeStream
      .format("memory")
      .queryName("tumbling_test")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    val streamed = spark.table("tumbling_test")
      .orderBy("window_start", "event_type").collect().toSeq
    q.stop()

    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch)
  }

  test("streamed hopping-window counts equal the batch result") {
    val batch = EventStream.hoppingCounts(Tables.events(spark, sfDir))
      .orderBy("window_start", "event_type").collect().toSeq

    val q = EventStream.hoppingCounts(
        streamedEvents().withWatermark("ts", "1 hour"))
      .writeStream
      .format("memory")
      .queryName("hopping_test")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    val streamed = spark.table("hopping_test")
      .orderBy("window_start", "event_type").collect().toSeq
    q.stop()

    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch)
    // every event lands in exactly window/slide = 2 windows
    val nEvents = Tables.events(spark, sfDir).count()
    assert(batch.map(_.getAs[Long]("n")).sum == 2 * nEvents)
  }

  test("foreachBatch upsert sink is idempotent across redeliveries") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_upstream")
    val landing = root.resolve("landing")
    Files.createDirectories(landing)
    val table = root.resolve("table").toString

    def drop(name: String, rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("event_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite")
        .parquet(landing.resolve(name).toString)

    drop("b1", Seq((1L, "click", 1.0), (2L, "view", 2.0)))
    val schema = spark.read.parquet(landing.resolve("b1").toString).schema
    val q = EventStream.upsertStream(
      spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(landing.toString),
      table, Seq("event_id"))
    q.processAllAvailable()
    assert(spark.read.parquet(table).count() == 2)

    // redelivery of key 2 (re-stated value) + a new key: upsert, not append
    drop("b2", Seq((2L, "view", 99.0), (3L, "purchase", 3.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(table).orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 99.0), (3L, 3.0)))
  }

  test("upsert sink: latest event-time wins within a batch; all-key batches dedup") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_upwin")
    val landing = root.resolve("landing")
    Files.createDirectories(landing)
    val table = root.resolve("table").toString

    // Key 7 arrives twice in ONE batch: the older event has the
    // lexicographically LARGER payload ("zzz"), so non-key ordering alone
    // would pick the stale row — event-time-first ordering must win.
    def drop(name: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("event_id", "ts_ms", "payload")
        .coalesce(1).write.mode("overwrite")
        .parquet(landing.resolve(name).toString)
    drop("b1", Seq((7L, 100L, "zzz"), (7L, 200L, "aaa")))
    val schema = spark.read.parquet(landing.resolve("b1").toString).schema
    val q = EventStream.upsertStream(
      spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(landing.toString),
      table, Seq("event_id"))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((7L, 200L, "aaa")))

    // Every column a key: duplicate rows collapse instead of throwing on
    // an empty window ordering.
    val root2 = Files.createTempDirectory("graft_upallkey")
    val landing2 = root2.resolve("landing")
    Files.createDirectories(landing2)
    val table2 = root2.resolve("table").toString
    Seq((1L, "a"), (1L, "a"), (2L, "b"))
      .toDF("k1", "k2").coalesce(1).write.mode("overwrite")
      .parquet(landing2.resolve("b1").toString)
    val schema2 = spark.read.parquet(landing2.resolve("b1").toString).schema
    val q2 = EventStream.upsertStream(
      spark.readStream.schema(schema2)
        .option("recursiveFileLookup", "true").parquet(landing2.toString),
      table2, Seq("k1", "k2"))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(table2).count() == 2)
  }

  test("dropDuplicatesWithinWatermark: dedup inside horizon, evict beyond") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_wmdedup")
    val landing = root.resolve("landing")
    Files.createDirectories(landing)

    def drop(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit =
      rows.toDF("event_id", "ts")
        .coalesce(1).write.mode("overwrite")
        .parquet(landing.resolve(name).toString)
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    drop("b1", Seq((1L, t("2026-01-01 10:00:00")),
                   (1L, t("2026-01-01 10:00:00"))))  // same-batch dup
    val schema = spark.read.parquet(landing.resolve("b1").toString).schema
    val q = EventStream.dedupWithinWatermark(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(landing.toString),
        Seq("event_id"), "ts", "30 minutes")
      .writeStream.format("memory").queryName("wmdedup")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2 pushes the watermark to 11:30 (12:00 − 30 min), ageing out
    // key 1's state (expired 10:30)
    drop("b2", Seq((2L, t("2026-01-01 12:00:00"))))
    q.processAllAvailable()
    // key 1 re-delivered AFTER its state evicted: emitted again — the
    // horizon, not stream lifetime, is the dedup contract
    drop("b3", Seq((1L, t("2026-01-01 12:01:00")),
                   (2L, t("2026-01-01 12:01:00"))))  // key 2 still live: dropped
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wmdedup")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSeq.sorted
    assert(got == Seq(
      (1L, "2026-01-01 10:00:00.0"),
      (1L, "2026-01-01 12:01:00.0"),
      (2L, "2026-01-01 12:00:00.0")))
  }

  test("stream-static join enriches events with a dimension table") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ssjoin")
    val landing = root.resolve("landing")
    Files.createDirectories(landing)
    // static dimension: joined per micro-batch, re-read lazily — the
    // standard streaming enrichment (broadcast-sized dim ⇒ no stateful
    // shuffle, unlike stream-stream joins)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")

    def drop(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("event_id", "user_id", "value")
        .coalesce(1).write.mode("overwrite")
        .parquet(landing.resolve(name).toString)
    drop("b1", Seq((10L, 1L, 5.0), (11L, 3L, 7.0)))  // user 3: no dim row
    val schema = spark.read.parquet(landing.resolve("b1").toString).schema
    val src = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(landing.toString)
    val q = EventStream.enrichWithDimension(src, dim, "user_id")
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    q.processAllAvailable()
    drop("b2", Seq((12L, 2L, 9.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin")
      .collect().map(r => (r.getLong(1), Option(r.getString(3)))).toSeq.sorted
    assert(got == Seq((10L, Some("gold")), (11L, None), (12L, Some("basic"))))
  }

  test("stream-stream interval join attributes clicks within the horizon") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ssij")
    val imps = root.resolve("imps"); val clicks = root.resolve("clicks")
    Files.createDirectories(imps); Files.createDirectories(clicks)

    def dropImps(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("imp_id", "s").select(col("imp_id"),
          to_timestamp(col("s")).as("imp_ts"))
        .coalesce(1).write.parquet(imps.resolve(name).toString)
    def dropClicks(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("click_imp_id", "s").select(col("click_imp_id"),
          to_timestamp(col("s")).as("click_ts"))
        .coalesce(1).write.parquet(clicks.resolve(name).toString)

    dropImps("b1", Seq((1L, "2026-01-01 10:00:00"), (2L, "2026-01-01 10:05:00")))
    dropClicks("b1", Seq((1L, "2026-01-01 10:20:00")))

    val impSchema = spark.read.parquet(imps.resolve("b1").toString).schema
    val clickSchema = spark.read.parquet(clicks.resolve("b1").toString).schema
    def stream(dir: java.nio.file.Path, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(dir.toString)

    val q = EventStream.attributeClicks(
        stream(imps, impSchema), stream(clicks, clickSchema),
        watermark = "10 minutes", horizon = "30 minutes")
      .writeStream.format("memory").queryName("ssij")
      .outputMode("append").start()
    q.processAllAvailable()
    // 2nd micro-batch: one more in-horizon click for imp 1, one click for
    // imp 2 far beyond the 30-minute horizon (must NOT match).
    dropClicks("b2", Seq((1L, "2026-01-01 10:25:00"), (2L, "2026-01-01 11:00:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssij")
      .select("imp_id", "click_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSeq.sorted
    assert(got == Seq(
      (1L, "2026-01-01 10:20:00.0"), (1L, "2026-01-01 10:25:00.0")))

    // batch face of the same plan over the full data agrees.
    val allImps = spark.read.option("recursiveFileLookup", "true")
      .parquet(imps.toString)
    val allClicks = spark.read.option("recursiveFileLookup", "true")
      .parquet(clicks.toString)
    val batch = EventStream.attributeClicks(allImps, allClicks,
        "10 minutes", "30 minutes")
      .select("imp_id", "click_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSeq.sorted
    assert(batch == got)
  }

  test("flatMapGroupsWithState carries per-user state across micro-batches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_state")
    val landing = root.resolve("landing")
    Files.createDirectories(landing)

    def drop(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ts_ms", "value")
        .coalesce(1).write.mode("overwrite")
        .parquet(landing.resolve(name).toString)

    drop("b1", Seq((1L, 100L, 2.0), (1L, 200L, 3.0), (2L, 150L, 1.0)))
    val schema = spark.read.parquet(landing.resolve("b1").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(landing.toString)
      .as[(Long, Long, Double)]
    val q = EventStream.userProfiles(stream)
      .writeStream.format("memory").queryName("profiles")
      .outputMode("update").start()
    q.processAllAvailable()
    // second batch: user 1 returns, user 3 is new
    drop("b2", Seq((1L, 300L, 5.0), (3L, 50L, 7.0)))
    q.processAllAvailable()
    q.stop()

    // update-mode memory sink: the LAST emission per user is its state
    val fin = spark.table("profiles")
      .groupBy("userId")
      .agg(max(struct(col("nEvents"), col("totalValue"), col("lastTsMs")))
        .as("s"))
      .select(col("userId"), col("s.nEvents"), col("s.totalValue"),
        col("s.lastTsMs"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        r.getLong(3)))).toMap
    assert(fin(1L) == ((3L, 10.0, 300L)))  // 2 events batch 1 + 1 in batch 2
    assert(fin(2L) == ((1L, 1.0, 150L)))
    assert(fin(3L) == ((1L, 7.0, 50L)))
  }

  test("restart from checkpoint is exactly-once: old batches not recounted") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_restart")
    val landing = root.resolve("landing")
    Files.createDirectories(landing)
    val ckpt = root.resolve("ckpt").toString
    val out = root.resolve("out").toString

    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("event_id", "event_type").coalesce(1).write.mode("overwrite")
        .parquet(landing.resolve(name).toString)

    drop("b1", (1L to 10L).map(i => (i, if (i % 2 == 0) "click" else "view")))
    val schema = spark.read.parquet(landing.resolve("b1").toString).schema
    def startQ() = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(landing.toString)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.coalesce(1).write.mode("overwrite").parquet(out)
      }
      .start()

    val q1 = startQ(); q1.processAllAvailable(); q1.stop()
    val first = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == Map("click" -> 5L, "view" -> 5L))

    // a NEW query instance resumes from the checkpoint: committed source
    // offsets mean b1 is not re-read, but its counts persist in state —
    // double-counting OR state loss would both break the totals.
    drop("b2", Seq((11L, "click", 0), (12L, "click", 0))
      .map { case (i, t, _) => (i, t) })
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()
    val resumed = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(resumed == Map("click" -> 7L, "view" -> 5L),
      s"restart broke exactly-once: $resumed")
  }

  test("CMS counter table streamed across micro-batches equals the batch sketch") {
    // the sketch-update aggregation is streaming-native: its state is
    // d·w cells regardless of how many keys the stream has seen.
    val batch = graft.operators.Sketch.cmsCounters(
        Tables.events(spark, sfDir).select("user_id"))
      .orderBy("row", "bucket").collect().toSeq

    val q = graft.operators.Sketch.cmsCounters(
        streamedEvents().select("user_id"))
      .writeStream
      .format("memory")
      .queryName("cms_test")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    val streamed = spark.table("cms_test")
      .orderBy("row", "bucket").collect().toSeq
    q.stop()

    assert(streamed == batch)
    assert(batch.size <= 3 * 64) // state bounded by cells, not keys
  }

  test("watermark evicts state in append mode (late data dropped)") {
    val q = EventStream.tumblingCounts(
        streamedEvents().withWatermark("ts", "1 hour"))
      .writeStream
      .format("memory")
      .queryName("append_test")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    val appended = spark.table("append_test")
    // In append mode only windows older than the watermark emit; with the
    // full month of data in one batch, all but the final hour's windows
    // are final.
    assert(appended.count() > 0)
    val progress = q.lastProgress
    assert(progress.stateOperators.nonEmpty)
    q.stop()
  }
}
