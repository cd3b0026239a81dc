package graft

import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline._

class MediaSpec extends SparkSpecBase {

  test("decoder seam: swapping decoders changes features, plumbing unchanged") {
    implicit val s = spark
    val media = MediaPipeline.toMedia(Tables.documents(spark, sfDir))
    // An "inverting" decoder — stands in for any real codec.
    val inverting = new MediaDecoder {
      def decodeBatch(ps: Seq[Array[Byte]]): Seq[Array[Int]] =
        ps.map(_.map(b => 255 - (b & 0xff)))
    }
    val fake = MediaPipeline.extractFeatures(media, FakeDecoder)
      .collect().map(f => f.id -> f).toMap
    val inv = MediaPipeline.extractFeatures(media, inverting)
      .collect().map(f => f.id -> f).toMap
    assert(fake.keySet == inv.keySet)
    fake.foreach { case (id, f) =>
      val g = inv(id)
      assert(f.n_bytes == g.n_bytes)      // geometry identical
      assert(f.n_frames == g.n_frames)
      assert(f.head_byte == 255 - g.head_byte)
      assert(math.abs((f.mean_luma + g.mean_luma) - 255.0) < 1e-9)
    }
  }

  test("batch geometry: no batch exceeds BatchSize and totals add up") {
    implicit val s = spark
    val media = MediaPipeline.toMedia(Tables.documents(spark, sfDir))
    val stats = MediaPipeline.batchStats(media, nShards = 4).collect()
    val total = stats.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables.documents(spark, sfDir).count())
    stats.foreach { r =>
      assert(r.getAs[Int]("max_batch") <= MediaPipeline.BatchSize)
    }
  }

  test("frame sampling keeps every Nth frame with exact per-frame means") {
    implicit val s = spark
    import s.implicits._
    // payload of 10 bytes, frames of width 3 × height 1 → frames
    // [1,2,3] [4,5,6] [7,8,9] [10]; everyN=2 keeps idx 0 and 2
    val media = Seq(MediaRow(7L, "k",
      Array.tabulate(10)(i => (i + 1).toByte), MediaMeta("m", 3, 1))).toDS()
    val got = MediaPipeline.sampleFrames(media, FakeDecoder, everyN = 2)
      .orderBy("frame_idx").collect()
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(got(0).mean_luma == 2.0)          // (1+2+3)/3
    assert(got(1).mean_luma == 8.0)          // (7+8+9)/3
    assert(got(1).n_px == 3)
  }

  test("nearest-neighbor resize halves a frame deterministically") {
    implicit val s = spark
    import s.implicits._
    // 4×2 plane → 2×1 thumbnail picks pixels (0,0) and (0,2)
    val plane = Array(10, 20, 30, 40, 50, 60, 70, 80)
    assert(MediaPipeline.resizePlane(plane, 4, 2, 2, 1).toSeq == Seq(10, 30))
    val media = Seq(MediaRow(1L, "k",
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80), MediaMeta("m", 4, 2))).toDS()
    val thumb = MediaPipeline.resizedThumbnails(media, FakeDecoder, 2, 1)
      .collect()(0)
    assert(thumb.pixels.toSeq == Seq(10, 30))
    assert(thumb.out_w == 2 && thumb.out_h == 1)
  }

  test("perceptual hash: non-negative, payload-determined, mean-threshold exact") {
    implicit val s = spark
    import s.implicits._
    // Two identical payloads must collide; a constant plane (no sample
    // strictly above its mean) must hash to 0; bit 63 is never set.
    val flat = Array.fill[Byte](100)(42)
    val ramp = Array.tabulate[Byte](100)(i => i.toByte)
    val media = Seq(
      MediaRow(1L, "k", ramp, MediaMeta("m", 10, 10)),
      MediaRow(2L, "k", ramp.clone(), MediaMeta("m", 10, 10)),
      MediaRow(3L, "k", flat, MediaMeta("m", 10, 10))).toDS()
    val hs = MediaPipeline.perceptualHashes(media, FakeDecoder)
      .collect().map(h => h.id -> h.phash).toMap
    assert(hs(1L) == hs(2L))
    assert(hs(3L) == 0L)
    hs.values.foreach { h => assert(h >= 0L) }
    // ramp: sample x reads plane((x*100)/63); values above the sample
    // mean set the high-index bits — recompute independently here.
    val n = 63
    val samples = Array.tabulate(n)(x => ramp((x * 100) / 63).toLong)
    val mean = samples.sum.toDouble / n
    val expect = samples.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v.toDouble > mean) acc | (1L << i) else acc
    }
    assert(hs(1L) == expect)
  }

  test("streaming grouper: exact batch counts on a partition holding many shards") {
    implicit val s = spark
    import s.implicits._
    // 10k rows, 3 shards — far more rows than one decode batch, with
    // shard runs that end mid-batch; the grouper must cut exactly at
    // shard boundaries and BatchSize, holding one row at a time.
    val big = (0L until 10000L).map { i =>
      MediaRow(i, "k", Array[Byte](1, 2, 3), MediaMeta("m", 1, 1))
    }.toDS()
    val stats = MediaPipeline.batchStats(big, nShards = 3)
      .orderBy("shard").collect()
    // id % 3: shard 0 has 3334 rows, shards 1-2 have 3333.
    val expect = Map(0 -> 3334L, 1 -> 3333L, 2 -> 3333L)
    assert(stats.length == 3)
    stats.foreach { r =>
      val shard = r.getAs[Int]("shard")
      val n = expect(shard)
      assert(r.getAs[Long]("n_rows") == n)
      val b = MediaPipeline.BatchSize
      assert(r.getAs[Long]("n_batches") == (n + b - 1) / b)
      assert(r.getAs[Int]("max_batch") == b)
      assert(r.getAs[Int]("min_batch") == (n % b).toInt)
    }
  }
}
