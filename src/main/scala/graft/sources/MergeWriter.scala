package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** If a previous upsert crashed mid-swap, put the table back: a
    * complete tmp (its _SUCCESS marker exists) wins — it holds the merged
    * new version — else the retired old version is restored. Called
    * automatically by upsertParquet; call directly before reads if a
    * crash is suspected. Single-writer is assumed throughout (the
    * reference is single-writer too — SQLite, README.md:850-866);
    * concurrent readers during the swap window need a catalog/lakehouse
    * layer instead. */
  def recover(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(path)
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
    * O(|batch| + one key-column collision scan); a sustained
    * 10×50k-batch run against a 500k-signature store measured the
    * whole-table rewrite growing per batch exactly as O(store) predicts.
    * Crash safety: Spark's committer stages task files under
    * `_temporary` (ignored by readers) until commit, and a redelivered
    * batch COLLIDES with its own earlier append, falling back to the
    * dedup'ing rewrite — idempotence is unchanged. */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame,
                    keys: Seq[String],
                    partitionCols: Seq[String] = Nil): Unit = {
    recover(spark, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) {
      swapIn(spark, path, updates, partitionCols)
      return
    }
    val target = spark.read.parquet(path)
    def shape(df: DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSet
    val canAppend = shape(target) == shape(updates) && {
      import org.apache.spark.sql.functions.col
      // key-pruned scan of the table probed against the batch's keys;
      // any hit means a genuine update (or a redelivery) → full merge
      target.select(keys.map(col): _*)
        .join(updates.select(keys.map(col): _*).distinct(), keys, "left_semi")
        .isEmpty
    }
    if (canAppend) {
      import org.apache.spark.sql.functions.col
      // column order pinned to the table's so every file carries the
      // same layout (readers merge by name, but keep footers uniform)
      val writer = updates.select(target.columns.map(col): _*)
        .write.mode("append")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
       else writer).parquet(path)
    } else
      swapIn(spark, path, merge(target, updates, keys), partitionCols)
  }

  /** Write `next` beside `path` and promote it with the two-rename swap
    * (every crash point covered by [[recover]]). Shared tail of the
    * upsert / delete / compact rewrites. */
  private def swapIn(spark: SparkSession, path: String, next: DataFrame,
                     partitionCols: Seq[String] = Nil): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(path)
    val tmp = new Path(path + ".__tmp__")
    val writer = next.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp.toString)
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
    * pruning the warehouse relies on). */
  def deleteParquet(spark: SparkSession, path: String,
                    tombstones: DataFrame, keys: Seq[String],
                    partitionCols: Seq[String] = Nil): Unit = {
    recover(spark, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(path)
    if (!fs.exists(cur)) return
    val kept = spark.read.parquet(path)
      .join(tombstones.select(keys.map(
        org.apache.spark.sql.functions.col): _*).distinct(), keys, "left_anti")
    swapIn(spark, path, kept, partitionCols)
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
    * layout flattens (per-partition compaction needs none). */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileBytes: Long = 128L << 20,
                     partitionCols: Seq[String] = Nil): Unit = {
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
  }
}
