package graft

import graft.sources.MergeWriter
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MergeWriterSpec extends SparkSpecBase {

  test("merge keeps unmatched target rows and takes updates wholesale") {
    import spark.implicits._
    val target = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq((2, "B", 99.0), (4, "d", 40.0)).toDF("k", "s", "v")
    val merged = MergeWriter.merge(target, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(merged.toSeq == Seq((1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0), (4, "d", 40.0)))
  }

  test("merge is idempotent (re-running a visit is a no-op)") {
    import spark.implicits._
    val target = Seq((1, 10.0), (2, 20.0)).toDF("k", "v")
    val updates = Seq((2, 99.0), (3, 30.0)).toDF("k", "v")
    val once = MergeWriter.merge(target, updates, Seq("k"))
    val twice = MergeWriter.merge(once, updates, Seq("k"))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("upsertParquet creates, updates, and survives re-runs on disk") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    // create
    MergeWriter.upsertParquet(spark, dir,
      Seq((1, "x"), (2, "y")).toDF("k", "s"), Seq("k"))
    assert(spark.read.parquet(dir).count() == 2)
    // update + insert
    MergeWriter.upsertParquet(spark, dir,
      Seq((2, "Y"), (3, "z")).toDF("k", "s"), Seq("k"))
    val got = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "x"), (2, "Y"), (3, "z")))
    // idempotent re-run
    MergeWriter.upsertParquet(spark, dir,
      Seq((2, "Y"), (3, "z")).toDF("k", "s"), Seq("k"))
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("insert-only batches append files; collisions fall back to the rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    MergeWriter.upsertParquet(spark, dir,
      Seq((1, "a"), (2, "b")).toDF("k", "s"), Seq("k"))
    def files() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = files()
    // disjoint keys → the fast path must APPEND: every original file
    // survives untouched (a rewrite would replace the directory)
    MergeWriter.upsertParquet(spark, dir,
      Seq((3, "c"), (4, "d")).toDF("k", "s"), Seq("k"))
    assert(before.subsetOf(files()),
      "insert-only upsert rewrote the table instead of appending")
    assert(spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // a colliding batch (an update + a redelivery) must take the merge
    // path: the key's row is REPLACED, not duplicated
    MergeWriter.upsertParquet(spark, dir,
      Seq((4, "D"), (5, "e")).toDF("k", "s"), Seq("k"))
    val got = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "a"), (2, "b"), (3, "c"), (4, "D"), (5, "e")))
    // redelivering the SAME batch collides with its own earlier append
    // → dedup'ing rewrite → idempotent
    MergeWriter.upsertParquet(spark, dir,
      Seq((4, "D"), (5, "e")).toDF("k", "s"), Seq("k"))
    assert(spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq == got)
  }

  test("additive schema evolution: new columns backfill null, wholesale rule holds") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    MergeWriter.upsertParquet(spark, dir,
      Seq((1, "x"), (2, "y")).toDF("k", "s"), Seq("k"))
    // a later batch gains column q: untouched rows read null
    MergeWriter.upsertParquet(spark, dir,
      Seq((2, "Y", 9.0), (3, "z", 7.0)).toDF("k", "s", "q"), Seq("k"))
    val got = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq((1, "x", None), (2, "Y", Some(9.0)), (3, "z", Some(7.0))))
    // a still-later batch WITHOUT q: its rows replace wholesale (q null),
    // rows it doesn't touch keep their q
    MergeWriter.upsertParquet(spark, dir,
      Seq((3, "Z")).toDF("k", "s"), Seq("k"))
    val after = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(after == Seq((1, "x", None), (2, "Y", Some(9.0)), (3, "Z", None)))
  }

  test("recover promotes a complete tmp after a mid-swap crash") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rec1").toString + "/t"
    // simulate: old = v1 (retired), tmp = v2 (complete, _SUCCESS), cur gone
    Seq((1, "v1")).toDF("k", "s").write.parquet(dir + ".__old__")
    Seq((1, "v2"), (2, "v2")).toDF("k", "s").write.parquet(dir + ".__tmp__")
    MergeWriter.recover(spark, dir)
    val got = spark.read.parquet(dir).orderBy("k")
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("v2", "v2"))
    // leftovers swept
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".__old__")))
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".__tmp__")))
  }

  test("recover restores the old version when tmp is incomplete") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rec2").toString + "/t"
    Seq((1, "v1")).toDF("k", "s").write.parquet(dir + ".__old__")
    // incomplete tmp: parquet dir without its _SUCCESS marker
    Seq((1, "v2")).toDF("k", "s").write.parquet(dir + ".__tmp__")
    Files.delete(java.nio.file.Paths.get(dir + ".__tmp__", "_SUCCESS"))
    MergeWriter.recover(spark, dir)
    val got = spark.read.parquet(dir).collect().map(_.getString(1)).toSeq
    assert(got == Seq("v1"))
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".__tmp__")))
  }

  test("deleteParquet erases matched keys, replays safely, skips absent tables") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_del").toString + "/t"
    MergeWriter.upsertParquet(spark,
      dir, Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v"), Seq("k"))
    val ts = Seq(2, 99).toDF("k") // one present, one absent
    MergeWriter.deleteParquet(spark, dir, ts, Seq("k"))
    MergeWriter.deleteParquet(spark, dir, ts, Seq("k")) // tombstone replay
    val got = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(got == Seq((1, 10.0), (3, 30.0)))
    // absent table: a no-op, not an error
    MergeWriter.deleteParquet(spark, dir + "_missing", ts, Seq("k"))
    // upsert after delete: the erased key can return
    MergeWriter.upsertParquet(spark, dir, Seq((2, 21.0)).toDF("k", "v"), Seq("k"))
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("compactParquet folds many small files into few, keeps rows, skips when compact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(20).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() == 20)
    val before = spark.read.parquet(dir).orderBy("k").collect().toSeq
    MergeWriter.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    assert(files() == 1, "small files not folded")
    assert(spark.read.parquet(dir).orderBy("k").collect().toSeq == before)
    // a second pass finds nothing to do and must not rewrite
    val mtime = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    MergeWriter.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    val mtime2 = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max
    assert(mtime2 == mtime, "no-op compaction rewrote the table")
  }

  test("recover rolls back a staged append that died mid-publish") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rec3").toString + "/t"
    MergeWriter.upsertParquet(spark, dir,
      Seq((1, "a"), (2, "b")).toDF("k", "s"), Seq("k"))
    val before = spark.read.parquet(dir).orderBy("k").collect().toSeq
    // simulate a crash in the rename window: one batch file is already
    // live, the marker still lists it (publish never completed)
    Seq((3, "c")).toDF("k", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir + ".__add__")
    val part = new java.io.File(dir + ".__add__").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.writeString(java.nio.file.Paths.get(dir + ".__addlog__"),
      part.getName + "\n")
    Files.move(part.toPath,
      java.nio.file.Paths.get(dir, part.getName))
    MergeWriter.recover(spark, dir)
    // all-or-nothing: the half-published batch is gone, the table is
    // exactly its pre-append state, all staging artifacts swept
    assert(spark.read.parquet(dir).orderBy("k").collect().toSeq == before)
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".__addlog__")))
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".__add__")))
    // and the sink still works after the rollback (caller retries)
    MergeWriter.upsertParquet(spark, dir, Seq((3, "c")).toDF("k", "s"), Seq("k"))
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("key-range index prunes the collision probe to zero table reads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idx").toString + "/t"
    // seed 100k rows with keys [0, 100k); index maintained
    MergeWriter.upsertParquet(spark, dir,
      spark.range(100000).selectExpr("id AS k", "CAST(id AS STRING) AS s"),
      Seq("k"), keyIndex = true)
    assert(new java.io.File(dir + ".__keyidx__").exists(),
      "keyIndex=true must build the sidecar")
    // records read across an insert-only upsert whose key range is
    // DISJOINT from the table's: the probe must answer from the index
    // without scanning the 100k stored rows
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(e.taskMetrics.inputMetrics.recordsRead): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MergeWriter.upsertParquet(spark, dir,
        spark.range(200000, 200100).selectExpr("id AS k", "CAST(id AS STRING) AS s"),
        Seq("k"), keyIndex = true)
      // listener events are async; give the bus a moment to drain
      val deadline = System.currentTimeMillis() + 5000
      while (read.get() < 100 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(spark.read.parquet(dir).count() == 100100)
    assert(read.get() < 50000,
      s"disjoint-range append read ${read.get()} records — the collision " +
        "probe scanned the table instead of pruning on the key index")
    // an OVERLAPPING batch must still detect its collision (update wins)
    MergeWriter.upsertParquet(spark, dir,
      Seq((5L, "FIVE")).toDF("k", "s"), Seq("k"), keyIndex = true)
    assert(spark.read.parquet(dir).filter($"k" === 5L)
      .collect().map(_.getString(1)).toSeq == Seq("FIVE"))
    assert(spark.read.parquet(dir).count() == 100100)
  }

  test("a lost key index degrades to the full probe, never past correctness") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idx2").toString + "/t"
    MergeWriter.upsertParquet(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), Seq("k"), keyIndex = true)
    MergeWriter.upsertParquet(spark, dir,
      Seq((3L, "c")).toDF("k", "s"), Seq("k"), keyIndex = true)
    // blow the sidecar away: appended files become unindexed
    def rmDir(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmDir)
      p.delete(): Unit
    }
    rmDir(new java.io.File(dir + ".__keyidx__"))
    // a redelivery of batch (3) must STILL collide (full-scan fallback)
    MergeWriter.upsertParquet(spark, dir,
      Seq((3L, "c")).toDF("k", "s"), Seq("k"))
    assert(spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("compaction with indexKeys rebuilds per-file ranges (probe recovery)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idx3").toString + "/t"
    MergeWriter.upsertParquet(spark, dir,
      spark.range(0, 1000).selectExpr("id AS k", "'x' AS s"), Seq("k"),
      keyIndex = true)
    (1 to 5).foreach { i =>
      MergeWriter.upsertParquet(spark, dir,
        spark.range(i * 1000L, i * 1000L + 1000).selectExpr("id AS k", "'x' AS s"),
        Seq("k"), keyIndex = true)
    }
    MergeWriter.compactParquet(spark, dir, targetFileBytes = 1L << 30,
      indexKeys = Seq("k"))
    // the rebuilt index must cover the compacted file(s): a disjoint
    // append right after compaction stays pruned AND correct
    val entries = new java.io.File(dir + ".__keyidx__").listFiles()
    assert(entries != null && entries.nonEmpty,
      "compaction must rebuild the key index it invalidated")
    MergeWriter.upsertParquet(spark, dir,
      Seq((99999L, "y")).toDF("k", "s"), Seq("k"), keyIndex = true)
    assert(spark.read.parquet(dir).count() == 6001)
    // overlap detection survives the rebuild too
    MergeWriter.upsertParquet(spark, dir,
      Seq((500L, "UPD")).toDF("k", "s"), Seq("k"), keyIndex = true)
    assert(spark.read.parquet(dir).count() == 6001)
    assert(spark.read.parquet(dir).filter($"k" === 500L)
      .head().getString(1) == "UPD")
  }

  test("composite keys prune conjunctively: one disjoint key column suffices") {
    import spark.implicits._
    // the streaming HITS shape: doc_a (= least of the pair) spans the
    // whole historical id range every batch, but doc_b (= greatest, the
    // current batch's fresh ids) is monotonic — the overlap test is a
    // conjunction over ALL key columns, so the disjoint doc_b range
    // alone must prune the collision probe to zero table reads
    val dir = Files.createTempDirectory("graft_idxc").toString + "/t"
    MergeWriter.upsertParquet(spark, dir,
      spark.range(50000).selectExpr("id % 100 AS a", "id + 1000 AS b", "'x' AS s"),
      Seq("a", "b"), keyIndex = true)
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(e.taskMetrics.inputMetrics.recordsRead): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // a overlaps [0,100) fully; b is disjoint (above the stored max)
      MergeWriter.upsertParquet(spark, dir,
        spark.range(200).selectExpr("id % 100 AS a", "id + 1000000 AS b", "'y' AS s"),
        Seq("a", "b"), keyIndex = true)
      val deadline = System.currentTimeMillis() + 5000
      while (read.get() < 100 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(spark.read.parquet(dir).count() == 50200)
    assert(read.get() < 25000,
      s"composite-key append read ${read.get()} records — the conjunctive " +
        "range test failed to prune on the disjoint key column")
    // and a batch overlapping on BOTH columns still detects its collision
    MergeWriter.upsertParquet(spark, dir,
      Seq((5L, 1005L, "UPD")).toDF("a", "b", "s"), Seq("a", "b"),
      keyIndex = true)
    assert(spark.read.parquet(dir).count() == 50200)
    assert(spark.read.parquet(dir).filter($"a" === 5L && $"b" === 1005L)
      .head().getString(2) == "UPD")
  }

  test("composite natural keys merge on the full key") {
    import spark.implicits._
    val target = Seq(("img1", 1, 1.0), ("img1", 2, 2.0)).toDF("img", "ap", "v")
    val updates = Seq(("img1", 2, 9.0)).toDF("img", "ap", "v")
    val got = MergeWriter.merge(target, updates, Seq("img", "ap"))
      .orderBy("img", "ap").collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(1.0, 9.0))
  }
}
