package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation beyond what AQE gives for free.
  *
  * AQE's skew-join handling (on in `GraftSession`) splits oversized
  * partitions of sort-merge joins at runtime, but a skewed GROUPING key
  * still funnels one key's every row through one task's aggregation
  * buffer upstream of any join. The classic fix is two-stage salted
  * aggregation: partially aggregate on (key, salt) — fanning the hot key
  * across `salts` tasks — then merge the partials on the key alone. Only
  * ALGEBRAIC aggregates (count/sum/min/max, and anything derived from
  * exact sums, i.e. this engine's whole Exact-moment family) merge
  * losslessly; means/stddevs must be derived from merged sums, never
  * averaged across salts.
  *
  * The salt is `pmod(hash(entire row), salts)` — deterministic (re-runs
  * agree; no rand(), which would also break Spark task retry semantics)
  * and key-independent, so a hot key's rows spread. Identical duplicate
  * rows share a salt; that only narrows the spread for exact-duplicate
  * floods, which exact dedup (d1) removes upstream anyway.
  */
object Skew {

  /** Two-stage salted count+sum per key; bit-equal to
    * `df.groupBy(keys).agg(count, sum(valueCol))` because both stages sum
    * exact types (counts are longs; route doubles through `Exact.dec2`
    * upstream when exactness matters). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int): DataFrame = {
    require(salts > 0)
    val allCols = df.columns.map(col)
    val salted = df.withColumn("_salt",
      pmod(hash(struct(allCols.toIndexedSeq: _*)), lit(salts)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as(s"sum_$valueCol"))
  }

  /** Salted broadcast-style join for a skewed big side against a small
    * side too large to broadcast: the small side is replicated `salts`
    * times, the big side salted per row, and the join key becomes
    * (keys, salt) — each hot-key partition now holds ~1/salts of that
    * key. Inner join only (replication would duplicate outer nulls). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0)
    val bigCols = big.columns.map(col)
    val saltedBig = big.withColumn("_salt",
      pmod(hash(struct(bigCols.toIndexedSeq: _*)), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, keys :+ "_salt").drop("_salt")
  }
}
