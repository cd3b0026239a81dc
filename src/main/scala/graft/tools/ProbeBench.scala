package graft.tools

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.MergeWriter
import graft.streaming.DocStream

/** Collision-probe headroom A/B (VERDICT r11 task 1a): the insert-only
  * append's key-collision probe was the last O(store)-per-batch term of
  * the streaming sink. With the key-range sidecar it prunes to files
  * whose key range overlaps the batch's — ZERO files for monotonic
  * ingest ids. This instrument seeds the sf10 signature store twice
  * (indexed / unindexed), appends the same disjoint-key batch to each,
  * and prints both upsert wall times: the gap is the store-sized scan
  * the index removes.
  *
  * Usage: runMain graft.tools.ProbeBench [seedDir] [batchN] [workDir] */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val seedDir = args.headOption.getOrElse("/root/repo/target/sf10")
    val batchN = args.lift(1).map(_.toInt).getOrElse(50000)
    val work = args.lift(2).getOrElse("/root/repo/target/probe_bench")
    val spark = GraftSession.local()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(work).getFileSystem(conf)
    fs.delete(new Path(work), true)

    val docs = spark.read.parquet(s"$seedDir/documents.parquet")
      .select("doc_id", "text")
    var t0 = System.nanoTime()
    DocStream.seedSignatureStore(docs, s"$work/indexed")
    println(f"[probe-bench] seeded indexed store in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(${spark.read.parquet(s"$work/indexed").count()}%d signatures)")
    // identical content, no sidecar → the probe must scan the store
    FileUtil.copy(fs, new Path(s"$work/indexed"),
      fs, new Path(s"$work/plain"), false, conf)
    fs.delete(new Path(s"$work/plain.__keyidx__"), true)

    // disjoint batch: fresh ids above the store's max (the ingest shape)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val batch = graft.operators.Dedup.signatures(
      docs.limit(batchN)
        .withColumn("doc_id", col("doc_id") + lit(maxId + 1L))).persist()
    batch.count() // pay the signing once, outside both timed windows

    def timed(label: String, path: String, keyIndex: Boolean): Double = {
      val t = System.nanoTime()
      MergeWriter.upsertParquet(spark, path, batch, Seq("doc_id"),
        keyIndex = keyIndex)
      val dt = (System.nanoTime() - t) / 1e9
      println(f"[probe-bench] $label%-22s upsert of $batchN%d rows: $dt%.2f s")
      dt
    }
    val plain = timed("unindexed (full scan)", s"$work/plain", keyIndex = false)
    val pruned = timed("indexed (range-pruned)", s"$work/indexed", keyIndex = true)
    println(f"[probe-bench] probe pruning saves ${plain - pruned}%.2f s/batch " +
      f"(${plain / math.max(pruned, 1e-9)}%.1fx) at this store size — the " +
      "unindexed gap GROWS with the store, the indexed cost does not")
    spark.stop()
  }
}
