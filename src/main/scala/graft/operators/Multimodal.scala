package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.TextPrims
import graft.functions.TextPrims.DuckD
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

/** Multimodal operators as driver-checkable queries. The Spark side runs
  * the real typed `Dataset`/`mapPartitions` pipeline (MediaPipeline); the
  * oracle recomputes the stub features from the source text (payloads are
  * the UTF-8 bytes of ASCII `text`, so byte arithmetic == char
  * arithmetic).
  */
object Multimodal extends QueryPack {

  // -- m1: decode + feature extraction through the batched partition
  //    pipeline: byte stats, rolling byte hash, frame count, mean luma.
  private val m1MediaFeatures: Q = (s, dir) => {
    implicit val sp = s
    val media = MediaPipeline.toMedia(Tables.documents(s, dir))
    MediaPipeline.extractFeatures(media, MediaPipeline.FakeDecoder)
      .toDF()
      .select("id", "n_bytes", "head_byte", "byte_hash", "n_frames", "mean_luma")
      .orderBy("id")
  }

  private val m1Sql =
    s"""SELECT doc_id AS id,
       |       octet_length(encode(text)) AS n_bytes,
       |       ascii(substr(text, 1, 1)) AS head_byte,
       |       ${TextPrims.polyhash("text", DuckD)} AS byte_hash,
       |       octet_length(encode(text)) // 256 + 1 AS n_frames,
       |       CAST(CAST(list_sum(${TextPrims.asciiChars("text", DuckD)}) AS BIGINT) AS DOUBLE)
       |         / CAST(octet_length(encode(text)) AS DOUBLE) AS mean_luma
       |FROM documents ORDER BY id""".stripMargin

  // -- m2: batch geometry — rows per shard and the number of full/partial
  //    decode batches each shard produces (BatchSize = 64).
  private val m2BatchStats: Q = (s, dir) => {
    implicit val sp = s
    val media = MediaPipeline.toMedia(Tables.documents(s, dir))
    MediaPipeline.batchStats(media, nShards = 8)
      .orderBy("shard")
  }

  private val m2Sql =
    """WITH s AS (
      |  SELECT CAST(doc_id % 8 AS INT) AS shard, count(*) AS n_rows
      |  FROM documents GROUP BY 1)
      |SELECT shard,
      |       CAST(ceil(CAST(n_rows AS DOUBLE)/64.0) AS BIGINT) AS n_batches,
      |       n_rows,
      |       CAST(CASE WHEN n_rows >= 64 THEN 64 ELSE n_rows END AS INT) AS max_batch,
      |       CAST(CASE WHEN n_rows % 64 = 0 THEN 64 ELSE n_rows % 64 END AS INT) AS min_batch
      |FROM s ORDER BY shard""".stripMargin

  def queries: Map[String, Q] = Map(
    "m1_media_features" -> m1MediaFeatures,
    "m2_media_batch_stats" -> m2BatchStats)

  def oracles: Map[String, String] = Map(
    "m1_media_features" -> m1Sql,
    "m2_media_batch_stats" -> m2Sql)
}
