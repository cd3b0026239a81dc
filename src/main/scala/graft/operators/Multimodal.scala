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

  // -- m3: perceptual-hash near-duplicates — the media-modality face of
  //    d4: a 63-bit aHash per decoded plane (MediaPipeline
  //    .perceptualHashes), banded into 4×16-bit LSH keys, candidate
  //    pairs by band equality, then exact Hamming ≤ 12 on candidates —
  //    never O(n²). With a real decoder the same plan is image aHash
  //    dedup; the stub makes it byte-profile dedup, which the oracle
  //    recomputes from the source text.
  /** The m3 pair pipeline up to the Hamming filter — shared by the pair
    * query (m3) and the cluster query (m4). */
  private def phashPairs(s: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame = {
    implicit val sp = s
    val media = MediaPipeline.toMedia(Tables.documents(s, dir))
    // persisted: both sides of the band self-join read the hash table.
    val ph = MediaPipeline
      .perceptualHashes(media, MediaPipeline.FakeDecoder).toDF().persist()
    val bandCols = (0 until 4).map { b =>
      expr(s"struct(CAST($b AS INT) AS band_id, " +
        s"CAST(shiftright(phash, ${16 * b}) & 65535 AS BIGINT) AS bv)")
    }
    val bands = ph.select(col("id"), col("phash"),
        explode(array(bandCols: _*)).as("band"))
      .select(col("id"), col("phash"), col("band.band_id"), col("band.bv"))
    val a = bands.select(col("band_id"), col("bv"),
      col("id").as("id_a"), col("phash").as("pa"))
    val b2 = bands.select(col("band_id"), col("bv"),
      col("id").as("id_b"), col("phash").as("pb"))
    a.join(b2, Seq("band_id", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "pa", "pb").distinct()
      .withColumn("hamming",
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .filter(col("hamming") <= 12)
      .select("id_a", "id_b", "hamming")
  }

  private val m3PhashNearDup: Q = (s, dir) =>
    phashPairs(s, dir).orderBy("id_a", "id_b")

  // -- m4: media duplicate CLUSTERS — the d10 move on the image
  //    modality: connected components over the m3 pair graph, so a
  //    re-encoded image that matches two other variants collapses the
  //    whole set into one cluster with one canonical representative.
  private val m4PhashClusters: Q = (s, dir) => {
    val pairs = phashPairs(s, dir).select("id_a", "id_b").persist()
    val comp = Graph.connectedComponents(pairs, "id_a", "id_b")
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("id").as("media_id"), col("component").as("cluster_id"),
        col("cluster_size"))
      .orderBy("media_id")
  }

  /** The m3 CTE chain (sampled bytes → aHash → bands → candidates),
    * shared by the m3 and m4 oracles. */
  private val m3Ctes =
    """sm AS (
      |  SELECT doc_id, list_transform(range(0, 63), x ->
      |           CAST(ascii(substr(text, CAST((x * length(text)) // 63 + 1 AS INT), 1)) AS BIGINT)) AS smp
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, CAST(list_sum(smp) AS DOUBLE) / 63.0 AS mn, smp
      |  FROM sm),
      |ph AS (
      |  SELECT doc_id,
      |         CAST(list_sum(list_transform(range(0, 63), x ->
      |           CASE WHEN CAST(smp[CAST(x AS INT) + 1] AS DOUBLE) > mn
      |                THEN (CAST(1 AS BIGINT) << CAST(x AS INT))
      |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
      |  FROM h),
      |bands AS (
      |  SELECT doc_id, phash, b.band_id, (phash >> (16 * b.band_id)) & 65535 AS bv
      |  FROM ph, (SELECT unnest(range(0, 4)) AS band_id) b),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
      |         a.phash AS pa, c.phash AS pb
      |  FROM bands a JOIN bands c
      |    ON a.band_id = c.band_id AND a.bv = c.bv AND a.doc_id < c.doc_id)""".stripMargin

  private val m3Sql =
    s"""WITH $m3Ctes
       |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(pa, pb)) <= 12
       |ORDER BY id_a, id_b""".stripMargin

  private val m4Sql =
    s"""WITH RECURSIVE $m3Ctes,
       |pairs AS (
       |  SELECT id_a, id_b FROM cand WHERE bit_count(xor(pa, pb)) <= 12),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION ALL
       |  SELECT id_b AS a, id_a AS b FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (
       |  SELECT a AS media_id, LEAST(a, MIN(b)) AS cluster_id
       |  FROM reach GROUP BY a)
       |SELECT media_id, cluster_id,
       |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM comp ORDER BY media_id""".stripMargin

  // -- m5: frame sampling — the video-keyframe-extraction shape: decode,
  //    cut the plane into width×height frames, keep every 2nd, emit one
  //    stat row per kept frame (a 1→N generator stage riding the same
  //    batched mapPartitions decode as m1; binaries never shuffle — only
  //    the per-frame stats leave the scan stage). The trailing partial
  //    frame is kept (n_px < 256 marks it). Per-frame mean luma is one
  //    IEEE division of an exact integer sum, so the oracle recomputes it
  //    bit-exactly from the source text.
  private val m5FrameSample: Q = (s, dir) => {
    implicit val sp = s
    val media = MediaPipeline.toMedia(Tables.documents(s, dir))
    MediaPipeline.sampleFrames(media, MediaPipeline.FakeDecoder, everyN = 2)
      .toDF()
      .orderBy("id", "frame_idx")
  }

  private val m5Sql =
    """WITH d AS (
      |  SELECT doc_id AS id, text, octet_length(encode(text)) AS len
      |  FROM documents),
      |f AS (
      |  SELECT id, text, len,
      |         unnest(range(0, (len + 255)//256)) AS fi
      |  FROM d WHERE len > 0),
      |k AS (
      |  SELECT id, CAST(fi AS INT) AS frame_idx,
      |         CAST(CASE WHEN len - fi*256 < 256
      |              THEN len - fi*256 ELSE 256 END AS INT) AS n_px,
      |         list_transform(
      |           string_split(substr(text, CAST(fi*256 + 1 AS INT), 256), ''),
      |           c -> CAST(ascii(c) AS BIGINT)) AS px
      |  FROM f WHERE fi % 2 = 0)
      |SELECT id, frame_idx, n_px,
      |       CAST(CAST(list_sum(px) AS BIGINT) AS DOUBLE)
      |         / CAST(n_px AS DOUBLE) AS mean_luma
      |FROM k ORDER BY id, frame_idx""".stripMargin

  // -- m6: thumbnail resize — decode → first frame (zero-padded to
  //    width×height) → 8×1 nearest-neighbor downsample, the standard
  //    resize stage of an image-curation pipeline run through the same
  //    batched decode seam. With w=256, outW=8 the sample stride is 32:
  //    out pixel x = plane[32·x], zero where the payload is shorter. The
  //    thumbnail is emitted as a ':'-joined string (a stable row shape
  //    the oracle hash can compare without array-type coercion).
  private val m6Thumbnails: Q = (s, dir) => {
    implicit val sp = s
    val media = MediaPipeline.toMedia(Tables.documents(s, dir))
    MediaPipeline.resizedThumbnails(media, MediaPipeline.FakeDecoder,
        outW = 8, outH = 1)
      .toDF()
      .select(col("id"), col("out_w"), col("out_h"),
        expr("array_join(transform(pixels, x -> CAST(x AS STRING)), ':')")
          .as("px"))
      .orderBy("id")
  }

  private val m6Sql =
    """SELECT doc_id AS id, CAST(8 AS INT) AS out_w, CAST(1 AS INT) AS out_h,
      |       list_aggregate(list_transform(range(0, 8), x ->
      |         CAST(CASE WHEN x*32 < octet_length(encode(text))
      |              THEN ascii(substr(text, CAST(x*32 + 1 AS INT), 1))
      |              ELSE 0 END AS VARCHAR)), 'string_agg', ':') AS px
      |FROM documents ORDER BY id""".stripMargin

  def queries: Map[String, Q] = Map(
    "m1_media_features" -> m1MediaFeatures,
    "m2_media_batch_stats" -> m2BatchStats,
    "m3_phash_neardup" -> m3PhashNearDup,
    "m4_phash_clusters" -> m4PhashClusters,
    "m5_frame_sample" -> m5FrameSample,
    "m6_thumbnails" -> m6Thumbnails)

  def oracles: Map[String, String] = Map(
    "m1_media_features" -> m1Sql,
    "m2_media_batch_stats" -> m2Sql,
    "m3_phash_neardup" -> m3Sql,
    "m4_phash_clusters" -> m4Sql,
    "m5_frame_sample" -> m5Sql,
    "m6_thumbnails" -> m6Sql)
}
