package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Perf note (round-5 SkewProbe, sf0.1, 99:1 hot key, alternating reps,
  * broadcast off for the join probe): plain med 0.39/0.83 s (agg/join)
  * vs salted 0.49/0.96 s — partial aggregation and a sub-core-count hot
  * partition make plain faster at local scale; the salted forms are the
  * insurance for hot partitions ≫ cores and non-algebraic buffers (see
  * Skew scaladoc). These specs pin bit-equality, not speed. */
class SkewSpec extends SparkSpecBase {

  // 90% of rows share one hot key — the shape that single-tasks a plain
  // groupBy/join on that key.
  private lazy val skewed = {
    import spark.implicits._
    ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong)))
      .toDF("k", "v").repartition(8)
  }

  test("salted aggregation equals the direct groupBy exactly") {
    val got = Skew.saltedSumCount(skewed, Seq("k"), "v", salts = 16)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // the partial stage actually fans the hot key out across salts
    val partialGroups = skewed.withColumn("_salt",
        pmod(hash(struct(col("k"), col("v"))), lit(16)))
      .filter(col("k") === "hot").select("_salt").distinct().count()
    assert(partialGroups > 8, s"hot key landed on only $partialGroups salts")
  }

  test("bloom pruning has no false negatives") {
    // every true semi-join match must survive the filter: n_matched from
    // the query equals the exact semi-join count computed directly.
    val row = SparkEntry.queries("x3_bloom_prune")(spark, sfDir).collect()(0)
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, sfDir)
    val exact = li
      .join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .count()
    assert(row.getAs[Long]("n_matched") == exact)
    assert(row.getAs[Long]("n_candidates") ==
      row.getAs[Long]("n_matched") + row.getAs[Long]("n_false_pos"))
    assert(row.getAs[Long]("n_candidates") <= row.getAs[Long]("n_probe"))
  }

  test("salted join equals the plain inner join") {
    import spark.implicits._
    val small = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 10) }.toDF("k", "dim")
    val got = Skew.saltedJoin(skewed, small, Seq("k"), salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("dim").as("sd"))
      .orderBy("k").collect().toSeq
    val want = skewed.join(small, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("dim").as("sd"))
      .orderBy("k").collect().toSeq
    assert(got == want)
  }

  test("x9 bucketized interval join matches the naive inequality join " +
       "and plans as a hash join") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val raw = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val errs = raw.filter(_._2 == "error")
    val tgts = raw.filter(_._2 != "error")
    val W = 600000000L
    val expected = errs.map { case (id, _, m0) =>
      val in = tgts.filter(t => t._3 > m0 && t._3 < m0 + W)
      (id, in.size.toLong,
        in.count(_._2 == "click").toLong,
        in.count(_._2 == "view").toLong,
        in.count(_._2 == "purchase").toLong)
    }.filter(_._2 > 0)
      .sortBy { case (id, n, _, _, _) => (-n, id) }.take(20).toSeq
    val df = SparkEntry.queries("x9_interval_bucket_join")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the whole point: an equi-key exists, so no nested-loop join
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), plan)
    assert(ev.count() == raw.length.toLong)
  }
}
