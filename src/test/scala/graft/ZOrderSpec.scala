package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

/** Z-order layout: Morton math, content preservation, and the skipping
  * property itself — a box on the SECOND dimension prunes row groups
  * under the z layout where a linear sort on the first dimension prunes
  * nothing. */
class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  private def refSpread(x: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 32) { r |= ((x >> i) & 1L) << (2 * i); i += 1 }
    r
  }

  test("zValue matches a bit-by-bit reference interleave") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 3L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (0xABCDL, 0x1234L),
      (0xFFFFFFFFL, 0xFFFFFFFFL))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val want = cases.map { case (a, b) => refSpread(a) | (refSpread(b) << 1) }
    assert(got.toSeq == want)
  }

  test("clustering is pure layout: content identical to the source") {
    val li = Tables.lineitem(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("zspec_content").toString
    ZOrder.cluster(li, "l_partkey", "l_suppkey", 8)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    // order-insensitive content check: per-column exact sums + distincts
    val sig = (df: org.apache.spark.sql.DataFrame) => df.agg(
      sum(Exact.dec2(col("l_quantity"))).as("sq"),
      sum(col("l_partkey")).as("sp"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).as("dk"))
      .collect()(0).toSeq
    assert(sig(back) == sig(li))
  }

  test("second-dimension box: z layout prunes row groups, linear cannot") {
    val li = Tables.lineitem(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("zspec_prune")
    val lin = s"$base/linear"
    val zed = s"$base/zorder"
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(lin)
    ZOrder.cluster(li, "l_partkey", "l_suppkey", 16)
      .write.mode("overwrite").parquet(zed)

    // suppkey box [2,4] (~30% of 0..9), partkey unconstrained: every
    // linear file spans all suppkeys; z files tile both dimensions
    val (ltot, lhit) = ZOrder.overlappingRowGroups(spark, lin,
      "l_partkey", 0L, 999999L, "l_suppkey", 2L, 4L)
    val (ztot, zhit) = ZOrder.overlappingRowGroups(spark, zed,
      "l_partkey", 0L, 999999L, "l_suppkey", 2L, 4L)
    assert(ltot >= 16 && lhit == ltot,
      s"linear layout should be unprunable on suppkey: $lhit/$ltot")
    assert(zhit < ztot, s"z layout pruned nothing: $zhit/$ztot")
    assert(zhit <= (ztot * 3) / 4,
      s"z layout pruned too little for a 30% box: $zhit/$ztot")

    // 2-D box: z must not be WORSE than linear once the first dimension
    // constrains too (linear prunes on partkey alone)
    val (_, lhit2) = ZOrder.overlappingRowGroups(spark, lin,
      "l_partkey", 60L, 79L, "l_suppkey", 2L, 4L)
    val (_, zhit2) = ZOrder.overlappingRowGroups(spark, zed,
      "l_partkey", 60L, 79L, "l_suppkey", 2L, 4L)
    assert(zhit2 <= lhit2 + 1,
      s"z 2-D pruning far worse than linear: z=$zhit2 linear=$lhit2")
  }

  test("x6 box query pushes both range filters to the clustered scan") {
    val t = ZOrder.ensureZLineitem(spark, sfDir)
    val df = spark.table(t)
      .filter(col("l_partkey").between(59, 79) &&
              col("l_suppkey").between(1, 4))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    // leaf toString elides long filter lists — read the scan's full
    // metadata entry instead. sparkPlan, not executedPlan: under AQE the
    // executed root is AdaptiveSparkPlanExec, itself a leaf, so the scan
    // never surfaces through collectLeaves.
    val pushed = df.queryExecution.sparkPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }.mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(l_partkey") &&
           pushed.contains("LessThanOrEqual(l_partkey") &&
           pushed.contains("GreaterThanOrEqual(l_suppkey") &&
           pushed.contains("LessThanOrEqual(l_suppkey"),
      "both box dimensions must reach the parquet reader: " + pushed)
  }
}
