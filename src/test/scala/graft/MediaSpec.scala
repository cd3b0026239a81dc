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
}
