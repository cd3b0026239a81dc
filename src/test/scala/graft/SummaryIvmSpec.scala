package graft

import org.apache.spark.sql.functions._

/** Incremental maintenance of the lineitem summary table: a delta batch
  * folds in by decimal addition, redelivered batches are no-ops, and the
  * refreshed summary keeps serving the rewritten aggregate with results
  * identical to a full recompute over the grown fact. */
class SummaryIvmSpec extends SparkSpecBase {

  private def grainAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        sum(Exact.dec2(col("l_quantity"))).as("sum_l_quantity"),
        sum(Exact.dec2(col("l_extendedprice"))).as("sum_l_extendedprice"),
        sum(Exact.dec2(col("l_discount"))).as("sum_l_discount"),
        min(col("l_quantity")).as("min_l_quantity"),
        max(col("l_quantity")).as("max_l_quantity"),
        min(col("l_extendedprice")).as("min_l_extendedprice"),
        max(col("l_extendedprice")).as("max_l_extendedprice"),
        min(col("l_discount")).as("min_l_discount"),
        max(col("l_discount")).as("max_l_discount"))
      .orderBy("l_returnflag", "l_linestatus")

  test("delta merge equals full recompute; redelivery no-op; rewrite serves refreshed rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivm").toString
    Tables.lineitem(spark, sfDir).limit(300)
      .write.mode("overwrite").parquet(s"$root/lineitem.parquet")
    val name = plans.SummaryAgg.ensureLineitemSummary(spark, root)

    // materialize the delta once so fact-append and summary-merge see
    // the same rows (a lazy limit() could pick different ties twice)
    Tables.lineitem(spark, sfDir)
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc).limit(200)
      .write.mode("overwrite").parquet(s"$root/delta.parquet")
    val delta = spark.read.parquet(s"$root/delta.parquet")
    delta.write.mode("append").parquet(s"$root/lineitem.parquet")

    plans.SummaryAgg.appendLineitemDelta(spark, root, delta, Some(1L))
    plans.SummaryAgg.appendLineitemDelta(spark, root, delta, Some(1L)) // replay

    val summary = spark.table(name)
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val full = grainAgg(Tables.lineitem(spark, root)).collect().toSeq
    assert(summary == full,
      s"summary diverged from full recompute:\n$summary\nvs\n$full")

    // the refreshed summary serves the rewritten aggregate: plan reads
    // the grain table, rows match the kill-switch direct computation
    val q = Tables.lineitem(spark, root)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(Exact.dec2(col("l_quantity"))).cast("double").as("s"))
      .orderBy("l_returnflag")
    assert(q.queryExecution.executedPlan.toString.contains(name))
    val served = q.collect().toSeq
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(served == q.collect().toSeq)
    finally spark.conf.unset("spark.graft.mv.rewrite")
  }

  test("min/max/avg serve from the summary bit-identically to the fact") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivm_mm").toString
    Tables.lineitem(spark, sfDir).limit(400)
      .write.mode("overwrite").parquet(s"$root/lineitem.parquet")
    val name = plans.SummaryAgg.ensureLineitemSummary(spark, root)

    // built fresh per call: QueryExecution is cached per DataFrame, so
    // the kill-switch comparison needs a re-planned instance
    def q() = Tables.lineitem(spark, root)
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        min(col("l_quantity")).as("mn_qty"),
        max(col("l_extendedprice")).as("mx_price"),
        avg(Exact.dec2(col("l_discount"))).as("avg_disc"))
      .orderBy("l_returnflag")
    // rewrite fires: the plan reads the grain table, not the fact
    assert(q().queryExecution.executedPlan.toString.contains(name))
    val served = q().collect().toSeq
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try {
      assert(!q().queryExecution.executedPlan.toString.contains(name))
      // bit-identical, Decimal scale included (Row equality is exact)
      assert(served == q().collect().toSeq)
    } finally spark.conf.unset("spark.graft.mv.rewrite")

    // a delta append keeps min/max/avg serving correct (min-of-mins fold)
    val delta = Tables.lineitem(spark, sfDir)
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc).limit(120)
    delta.write.mode("overwrite").parquet(s"$root/dmm.parquet")
    val d = spark.read.parquet(s"$root/dmm.parquet")
    d.write.mode("append").parquet(s"$root/lineitem.parquet")
    plans.SummaryAgg.appendLineitemDelta(spark, root, d, Some(42L))
    val servedAfter = q().collect().toSeq
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(servedAfter == q().collect().toSeq)
    finally spark.conf.unset("spark.graft.mv.rewrite")
  }

  test("summaries for two base tables coexist: x8 serves from the orders grain") {
    val lName = plans.SummaryAgg.ensureLineitemSummary(spark, sfDir)
    val oName = plans.SummaryAgg.ensureOrdersSummary(spark, sfDir)
    def x8() = SparkEntry.queries("x8_mv_orders")(spark, sfDir)
    val plan = x8().queryExecution.executedPlan.toString
    assert(plan.contains(oName), s"x8 not served from the orders summary")
    assert(!plan.contains("orders.parquet"), "x8 still scans the fact")
    assert(!plan.contains(lName), "x8 wrongly touched the lineitem summary")
    // registry keyed by path: the lineitem-backed query still serves from
    // ITS summary with both registered
    val x5plan = SparkEntry.queries("x5_mv_rewrite")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(x5plan.contains(lName) && !x5plan.contains(oName))
    // soundness: kill switch equality
    val served = x8().collect().toSeq
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(served == x8().collect().toSeq)
    finally spark.conf.unset("spark.graft.mv.rewrite")
  }

  test("marker scopes isolate sinks: two streams' batch 0 both apply") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivm_sc").toString
    Tables.lineitem(spark, sfDir).limit(150)
      .write.mode("overwrite").parquet(s"$root/lineitem.parquet")
    val name = plans.SummaryAgg.ensureLineitemSummary(spark, root)
    Tables.lineitem(spark, sfDir).limit(230)
      .write.mode("overwrite").parquet(s"$root/d.parquet")
    val all = spark.read.parquet(s"$root/d.parquet")
    val d1 = all.filter(col("l_orderkey") % 2 === 0)
    val d2 = all.filter(col("l_orderkey") % 2 =!= 0)
    d1.unionByName(d2).write.mode("append").parquet(s"$root/lineitem.parquet")
    // same batchId from two DIFFERENT maintenance sinks: both must fold
    plans.SummaryAgg.appendLineitemDelta(spark, root, d1, Some(0L), "sinkA")
    plans.SummaryAgg.appendLineitemDelta(spark, root, d2, Some(0L), "sinkB")
    // replay within a scope is still a no-op
    plans.SummaryAgg.appendLineitemDelta(spark, root, d1, Some(0L), "sinkA")
    val summary = spark.table(name)
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val full = grainAgg(Tables.lineitem(spark, root)).collect().toSeq
    assert(summary == full, "scoped markers lost or double-applied a delta")
  }

  test("concurrent appends serialize: no delta is lost to a stale overwrite") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivm_cc").toString
    Tables.lineitem(spark, sfDir).limit(200)
      .write.mode("overwrite").parquet(s"$root/lineitem.parquet")
    val name = plans.SummaryAgg.ensureLineitemSummary(spark, root)

    val d1 = Tables.lineitem(spark, sfDir)
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc).limit(100)
    val d2 = Tables.lineitem(spark, sfDir)
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(100)
    d1.write.mode("overwrite").parquet(s"$root/d1.parquet")
    d2.write.mode("overwrite").parquet(s"$root/d2.parquet")
    val (r1, r2) = (spark.read.parquet(s"$root/d1.parquet"),
                    spark.read.parquet(s"$root/d2.parquet"))
    r1.write.mode("append").parquet(s"$root/lineitem.parquet")
    r2.write.mode("append").parquet(s"$root/lineitem.parquet")

    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    Await.result(Future.sequence(Seq(
      Future(plans.SummaryAgg.appendLineitemDelta(spark, root, r1, Some(10L))),
      Future(plans.SummaryAgg.appendLineitemDelta(spark, root, r2, Some(11L))))),
      5.minutes)

    val summary = spark.table(name)
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val full = grainAgg(Tables.lineitem(spark, root)).collect().toSeq
    assert(summary == full, "a concurrent append lost a delta")
  }

  test("streaming maintenance folds micro-batches into the summary") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivm_st").toString
    val landing = s"$root/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    Tables.lineitem(spark, sfDir).limit(250)
      .write.mode("overwrite").parquet(s"$root/lineitem.parquet")
    val name = plans.SummaryAgg.ensureLineitemSummary(spark, root)
    val schema = Tables.lineitem(spark, sfDir).schema

    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(landing)
    val q = plans.SummaryAgg.maintainLineitemSummary(stream, root, "spec-sink")

    Tables.lineitem(spark, sfDir)
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc).limit(150)
      .coalesce(1).write.mode("overwrite").parquet(s"$landing/b1")
    q.processAllAvailable()
    q.stop()

    // fact catches up with what streamed in; summary must already agree
    spark.read.parquet(s"$landing/b1")
      .write.mode("append").parquet(s"$root/lineitem.parquet")
    val summary = spark.table(name)
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val full = grainAgg(Tables.lineitem(spark, root)).collect().toSeq
    assert(summary == full)
  }
}
