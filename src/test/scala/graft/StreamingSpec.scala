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
    spark.readStream
      .schema(rawSchema)
      .parquet(landing.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
