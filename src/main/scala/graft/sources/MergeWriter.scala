package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, input_file_name, lit, max, min, regexp_replace}

/** Upsert-by-natural-key semantics over vanilla Parquet — the reference's
  * insert-or-update sink (/root/reference/wfc3_cte_monitor/
  * database_update.py:214-255) re-expressed as a set operation
  * (SURVEY.md §2.1 S5, §7.1).
  *
  * The reference looks up each row's natural key and issues INSERT or
  * UPDATE one row at a time over SQLite ("cannot parallelize", README.md:
  * 962-967). Here the whole batch merges in one distributed anti-join:
  * rows of `target` whose key collides with an update are dropped, then
  * updates are unioned in — O(|target| + |updates|) with a single shuffle
  * on the key (or none, if both sides are bucketed by the key).
  *
  * Idempotence (re-running a visit "is not bad", README.md:519-521) holds:
  * merging the same updates twice is a no-op.
  */
object MergeWriter {

  /** Pure merge: `target` rows not matched on `keys`, plus all `updates`.
    * Schemas may differ additively (a batch that gains or drops a
    * non-key column): the union aligns by name and null-backfills either
    * side — the parquet-level form of additive schema evolution. An
    * update still replaces its matched row WHOLESALE, so a column the
    * update batch doesn't carry reads null on updated rows (the winner
    * rule, not a partial column patch). */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates, keys, "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** If a previous upsert crashed mid-publish, put the table back.
    * Covers BOTH publish mechanisms:
    *  - the two-rename swap (rewrites): a complete tmp (its _SUCCESS
    *    marker exists) wins — it holds the merged new version — else the
    *    retired old version is restored;
    *  - the staged append: `path.__addlog__` lists the batch's files; if
    *    the marker is still present the publish died mid-rename and the
    *    listed files are ROLLED BACK out of the live directory (all of
    *    the batch or none of it — the caller retries/redelivers).
    * Called automatically by every write entry point; call directly
    * before reads if a crash is suspected. Single-writer is assumed
    * throughout (the reference is single-writer too — SQLite, README.md:
    * 850-866); concurrent readers during a publish window need a
    * catalog/lakehouse layer instead. */
  def recover(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(path)
    // staged-append rollback FIRST: a marker means some (possibly zero,
    // possibly all) of the listed files were renamed in before the crash
    val addlog = new Path(path + AddLogSuffix)
    if (fs.exists(addlog)) {
      readLines(fs, addlog).foreach { rel =>
        val f = new Path(cur, rel)
        if (fs.exists(f)) fs.delete(f, false)
      }
      fs.delete(addlog, false)
    }
    val stage = new Path(path + AddStageSuffix)
    if (fs.exists(stage)) fs.delete(stage, true)
    val tmp = new Path(path + ".__tmp__")
    val old = new Path(path + ".__old__")
    if (!fs.exists(cur)) {
      if (fs.exists(new Path(tmp, "_SUCCESS"))) fs.rename(tmp, cur)
      else if (fs.exists(old)) fs.rename(old, cur)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old) && fs.exists(cur)) fs.delete(old, true)
  }

  /** Parquet-backed upsert: read current table state (absent → empty),
    * merge, write fresh, swap directories with crash recovery. The swap
    * itself is two renames (no distributed FS offers an atomic directory
    * exchange); every crash point is covered by `recover`: before the
    * first rename the current version is intact, between them the
    * complete tmp is promoted, after them only the retired copy is left
    * to sweep. Partition-scoped overwrite at scale: pass the partition
    * subdir as `path` so only the touched partition rewrites.
    *
    * INSERT-ONLY FAST PATH: when no update key collides with the table
    * (and the schemas agree), the merge is mathematically an append —
    * target ⟕̸ updates = target — so the batch's rows are APPENDED as new
    * files instead of rewriting the whole table. That turns the
    * insert-dominant workload (streaming ingest: every batch is new
    * doc_ids except redeliveries) from O(|table|) per batch into
    * O(|batch|) plus the key-collision probe; a sustained 10×50k-batch
    * run against a 500k-signature store measured the whole-table rewrite
    * growing per batch exactly as O(store) predicts. The append
    * publishes through a staging dir + rename batch protected by an
    * on-disk marker, so the all-or-nothing crash contract is the SAME as
    * the rewrite's: a crash mid-publish rolls the whole batch back on
    * the next `recover` (the batch is simply not yet applied — callers
    * retry or, under streaming redelivery, re-run the batch). A
    * redelivered batch COLLIDES with its own earlier append and falls
    * back to the dedup'ing rewrite — idempotence is unchanged.
    *
    * `keyIndex = true` additionally maintains a per-file KEY-RANGE
    * sidecar (`path.__keyidx__`) so the collision probe prunes to files
    * whose key range overlaps the batch's — with naturally increasing
    * ingest keys that is ZERO files and the probe costs one O(|batch|)
    * aggregate instead of an O(|table|) key scan (the last per-batch
    * O(store) term of the streaming sink). Appends index their own files
    * from the batch aggregate; rewrites re-derive per-file ranges with
    * one column-pruned pass folded into the already-O(store) rewrite.
    * The index is advisory: files it doesn't cover are always probed, so
    * a lost/stale sidecar degrades to the unpruned scan, never past
    * correctness. Opt-in because a one-shot bulk upsert (the warehouse
    * restatement shape) would pay the rebuild pass for probes that never
    * come. */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame,
                    keys: Seq[String],
                    partitionCols: Seq[String] = Nil,
                    keyIndex: Boolean = false): Unit = {
    recover(spark, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) {
      swapIn(spark, path, updates, partitionCols)
      if (keyIndex) rebuildKeyIndex(spark, path, keys)
      return
    }
    if (keyIndex && !fs.exists(new Path(path + KeyIdxSuffix)))
      rebuildKeyIndex(spark, path, keys) // first indexed batch: cover the base
    val target = spark.read.parquet(path)
    def shape(df: DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSet
    val sameShape = shape(target) == shape(updates)
    // the batch's key ranges are computed AT MOST ONCE and threaded
    // through both consumers (the collision probe's overlap test and the
    // appended files' index entry): `updates` is often a lazy pipeline —
    // the streaming sink hands the whole probe's result in — and every
    // extra evaluation here re-runs it end to end. Lazy so an unindexed
    // table (the one-shot bulk-upsert shape) never pays the extra job.
    lazy val batchAgg: Option[org.apache.spark.sql.Row] =
      if (sameShape && indexableKeys(updates, keys)) {
        val aggCols = keys.flatMap(k => Seq(min(col(k)).as(s"bmin_$k"),
          max(col(k)).as(s"bmax_$k"))) :+ count(lit(1)).as("bn")
        Some(updates.agg(aggCols.head, aggCols.tail: _*).collect()(0))
      } else None
    val canAppend = sameShape &&
      !collides(spark, path, target, updates, keys, () => batchAgg)
    if (canAppend) {
      // column order pinned to the table's so every file carries the
      // same layout (readers merge by name, but keep footers uniform)
      val batch = updates.select(target.columns.map(col): _*)
      val rels = appendIn(spark, path, batch, partitionCols)
      batchAgg.filter(_ => keyIndex).foreach { agg =>
        import spark.implicits._
        val ranges = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(agg), 1), agg.schema)
          .select(keys.flatMap(k => Seq(col(s"bmin_$k").as(s"min_$k"),
            col(s"bmax_$k").as(s"max_$k"))): _*)
        writeIdxEntry(spark, path, keys,
          rels.toDF("file").crossJoin(broadcast(ranges)))
      }
    } else {
      swapIn(spark, path, merge(target, updates, keys), partitionCols)
      if (keyIndex) rebuildKeyIndex(spark, path, keys)
    }
  }

  // ---------------------------------------------------------------- append

  private val AddStageSuffix = ".__add__"
  private val AddLogSuffix = ".__addlog__"
  private val KeyIdxSuffix = ".__keyidx__"

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Write `lines` to `p` atomically: create under a temp name, then
    * rename (single-file rename is atomic on HDFS/local/object-store
    * emulations alike — the directory swap is what isn't). */
  private def writeLinesAtomic(fs: FileSystem, p: Path, lines: Seq[String]): Unit = {
    val tmp = new Path(p.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not publish marker $p")
  }

  /** Data files under `root`, as paths relative to it (partition subdirs
    * included). */
  private def listDataFiles(fs: FileSystem, root: Path): Seq[String] = {
    if (!fs.exists(root)) return Nil
    val rootUri = fs.makeQualified(root).toString
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val full = f.getPath.toString
        out += full.stripPrefix(rootUri).stripPrefix("/")
      }
    }
    out.toSeq
  }

  /** Stage-then-publish append: write the batch BESIDE the table, record
    * the staged file names in an on-disk marker, rename them in, clear
    * the marker. Readers never see a partial batch: task files stay in
    * the staging dir until every one is complete (_SUCCESS), and a crash
    * anywhere in the rename window leaves the marker for [[recover]] to
    * roll the whole batch back. Returns the published files' relative
    * paths. */
  private def appendIn(spark: SparkSession, path: String, batch: DataFrame,
                       partitionCols: Seq[String]): Seq[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(path + AddStageSuffix)
    fs.delete(stage, true)
    val writer = batch.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(stage.toString)
    val rels = listDataFiles(fs, stage)
    writeLinesAtomic(fs, new Path(path + AddLogSuffix), rels)
    val cur = new Path(path)
    rels.foreach { rel =>
      val dst = new Path(cur, rel)
      val parent = dst.getParent
      if (!fs.exists(parent)) fs.mkdirs(parent)
      if (!fs.rename(new Path(stage, rel), dst))
        throw new java.io.IOException(s"append publish failed at $rel")
    }
    fs.delete(new Path(path + AddLogSuffix), false)
    fs.delete(stage, true)
    rels
  }

  // ------------------------------------------------------- key-range index

  /** Key types the range index can prune on: orderable atomics whose
    * min/max are well-defined and comparable across engines. Anything
    * else (arrays, structs, maps) simply opts the index out. */
  private def indexableKeys(df: DataFrame, keys: Seq[String]): Boolean = {
    import org.apache.spark.sql.types._
    keys.forall(k => df.schema.fields.find(_.name == k).exists(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | DateType | TimestampType |
           TimestampNTZType | BooleanType => true
      case _: DecimalType => true
      case _ => false
    }))
  }

  private def idxMinMaxCols(keys: Seq[String]) =
    keys.flatMap(k => Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k")))

  /** Re-derive per-file key ranges from the table itself — one
    * column-pruned scan, paid only beside an already-O(store) rewrite.
    * Replaces the whole sidecar (rewrites invalidate every prior entry). */
  private def rebuildKeyIndex(spark: SparkSession, path: String,
                              keys: Seq[String]): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx = new Path(path + KeyIdxSuffix)
    fs.delete(idx, true)
    if (!fs.exists(new Path(path))) return
    val t = spark.read.parquet(path)
    if (!indexableKeys(t, keys)) return
    // normalize input_file_name (a full URI) to a table-relative path; a
    // degenerate match (table dir name repeated inside a partition dir)
    // yields a rel that matches no listed file and the file just stays
    // unindexed — the index only ever prunes, never excuses, a scan
    val dirName = java.util.regex.Pattern.quote(new Path(path).getName)
    val rows = t.select((keys.map(col) :+
        regexp_replace(input_file_name(), s"^.*$dirName/", "").as("file")): _*)
      .groupBy("file")
      .agg(idxMinMaxCols(keys).head, idxMinMaxCols(keys).tail: _*)
    writeIdxEntry(spark, path, keys, rows)
  }

  /** Append one entry dir to the sidecar. Entries are tiny (one row per
    * file); each write is its own parquet dir so appends never rewrite
    * the index. A torn entry (no _SUCCESS / unreadable) is ignored by
    * [[readKeyIndex]] and its files degrade to always-scanned. */
  private def writeIdxEntry(spark: SparkSession, path: String,
                            keys: Seq[String], rows: DataFrame): Unit = {
    val entry = s"$path$KeyIdxSuffix/e_${System.currentTimeMillis()}_${
      java.util.UUID.randomUUID.toString.take(8)}"
    rows.coalesce(1).write.mode("overwrite").parquet(entry)
  }

  /** All readable index entries, or None when the sidecar is absent or
    * unreadable (schema drift between entries, torn writes). Index size
    * is file-count-bounded (one row per data file, one entry dir per
    * append since the last rewrite), and compaction — which every
    * appending workload needs anyway for the data files themselves —
    * collapses the sidecar back to a single entry; the driver-side
    * collects in [[collides]] share that bound. */
  private def readKeyIndex(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx = new Path(path + KeyIdxSuffix)
    if (!fs.exists(idx)) return None
    val entries = fs.listStatus(idx).filter(_.isDirectory)
      .filter(e => fs.exists(new Path(e.getPath, "_SUCCESS")))
      .map(_.getPath.toString)
    if (entries.isEmpty) return None
    try {
      val df = spark.read.parquet(entries.toIndexedSeq: _*)
      df.schema // force schema resolution now, not at probe time
      Some(df)
    } catch { case _: Throwable => None }
  }

  /** Does any update key exist in the table? The probe behind the
    * insert-only fast path. With a key-range sidecar the table scan
    * prunes to files whose range overlaps the batch's (plus any file the
    * index doesn't cover); an empty candidate set answers without
    * touching the table OR the batch again (`batchAgg` — the batch's
    * precomputed key ranges — is the only evaluation of `updates` the
    * happy path needs, load-bearing when `updates` is a lazy pipeline).
    * Null keys never equi-join-match, so range rows from all-null files
    * prune away safely. */
  private def collides(spark: SparkSession, path: String, target: DataFrame,
                       updates: DataFrame, keys: Seq[String],
                       batchAgg: () => Option[org.apache.spark.sql.Row]): Boolean = {
    def probeKeys = updates.select(keys.map(col): _*).distinct()
    def fullScan() =
      !target.select(keys.map(col): _*).join(probeKeys, keys, "left_semi").isEmpty
    (readKeyIndex(spark, path) match {
      case Some(idx) => batchAgg().map(agg => (idx, agg))
      case None => None
    }) match {
      case Some((idx, agg)) =>
        val wanted = (Seq("file") ++ keys.flatMap(k => Seq(s"min_$k", s"max_$k")))
        if (!wanted.forall(idx.columns.contains(_))) return fullScan()
        if (agg.getAs[Long]("bn") == 0L) return false // empty batch
        val fs = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val actual = listDataFiles(fs, new Path(path)).toSet
        import spark.implicits._
        val bdf = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(agg), 1), agg.schema)
        val overlapPred = keys.map(k =>
          col(s"max_$k") >= col(s"bmin_$k") && col(s"min_$k") <= col(s"bmax_$k"))
          .reduce(_ && _)
        val overlapping = idx.crossJoin(broadcast(bdf)).filter(overlapPred)
          .select("file").as[String].collect().toSet
        val indexed = idx.select("file").as[String].collect().toSet
        val candidates = (actual & overlapping) ++ (actual -- indexed)
        if (candidates.isEmpty) false
        else {
          // basePath keeps hive-partition columns readable when the key
          // includes one and only a file subset is scanned
          val pruned = spark.read.option("basePath", path)
            .parquet(candidates.toSeq.sorted.map(r => s"$path/$r"): _*)
          if (!keys.forall(pruned.columns.contains(_))) fullScan()
          else !pruned.select(keys.map(col): _*)
            .join(probeKeys, keys, "left_semi").isEmpty
        }
      case _ => fullScan()
    }
  }

  // ---------------------------------------------------------------- swaps

  /** Write `next` beside `path` and promote it with the two-rename swap
    * (every crash point covered by [[recover]]). Shared tail of the
    * upsert / delete / compact rewrites. Invalidates the key-range
    * sidecar (every pre-rewrite entry names files that no longer exist);
    * callers that maintain the index rebuild it afterwards. */
  private def swapIn(spark: SparkSession, path: String, next: DataFrame,
                     partitionCols: Seq[String] = Nil): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(path)
    val tmp = new Path(path + ".__tmp__")
    val writer = next.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp.toString)
    fs.delete(new Path(path + KeyIdxSuffix), true)
    val old = new Path(path + ".__old__")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(cur)) fs.rename(cur, old)
    fs.rename(tmp, cur)
    fs.delete(old, true): Unit
  }

  /** Key-level delete: rewrite the table without rows whose `keys`
    * columns match any row of `tombstones` — the retraction half of the
    * upsert sink (GDPR erasure, index removals). Same anti-join shape
    * and same two-rename swap with crash recovery as upsertParquet;
    * deleting absent keys is a no-op, so redelivered tombstone batches
    * are idempotent. A missing table is a no-op too (nothing to erase).
    * Partition-scoped at scale exactly like the upsert: pass the
    * partition subdir as `path` to rewrite only the touched partition.
    * `partitionCols` carries the same contract as upsertParquet's — a
    * hive-partitioned table MUST pass its partition columns or the
    * rewrite flattens the directory layout (and with it the partition
    * pruning the warehouse relies on). `keyIndex` as in upsertParquet:
    * rebuild the range sidecar after the rewrite for appending callers. */
  def deleteParquet(spark: SparkSession, path: String,
                    tombstones: DataFrame, keys: Seq[String],
                    partitionCols: Seq[String] = Nil,
                    keyIndex: Boolean = false): Unit = {
    recover(spark, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(path)
    if (!fs.exists(cur)) return
    val kept = spark.read.parquet(path)
      .join(tombstones.select(keys.map(col): _*).distinct(), keys, "left_anti")
    swapIn(spark, path, kept, partitionCols)
    if (keyIndex) rebuildKeyIndex(spark, path, keys)
  }

  /** Small-file compaction — the warehouse-maintenance pass every
    * incrementally-written table needs: a steady drip of upsert/append
    * batches leaves a table as thousands of KB-files whose per-file open
    * and footer cost eventually dominates scans. Rewrite into
    * ~`targetFileBytes` files (same rows, same swap safety). Run it on a
    * schedule or when fileCount ≫ bytes/target; at scale, compact
    * per-partition by passing the partition subdir as `path`, which is
    * also what keeps the rewrite off the rest of the table. Same
    * `partitionCols` contract as upsert/delete: a hive-partitioned table
    * compacted at its ROOT must pass its partition columns or the
    * layout flattens (per-partition compaction needs none).
    * `indexKeys`: non-empty rebuilds the key-range sidecar after the
    * rewrite (compaction replaces every file, so an appending caller's
    * index must be re-derived or the next probe degrades to a full
    * scan — the post-compaction probe recovery the streaming sink
    * depends on). */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileBytes: Long = 128L << 20,
                     partitionCols: Seq[String] = Nil,
                     indexKeys: Seq[String] = Nil): Unit = {
    recover(spark, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(path)
    if (!fs.exists(cur)) return
    val it = fs.listFiles(cur, true)
    var bytes = 0L
    var nFiles = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        bytes += f.getLen; nFiles += 1
      }
    }
    val want = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    if (want >= nFiles) return // already compact enough: skip the rewrite
    swapIn(spark, path, spark.read.parquet(path).coalesce(want),
      partitionCols)
    if (indexKeys.nonEmpty) rebuildKeyIndex(spark, path, indexKeys)
  }
}
