package graft

import graft.plans.{GroupedTopK, GroupedTopKExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupedTopKSpec extends SparkSpecBase with AdaptiveSparkPlanHelper {

  // Deterministic skewed data: 40 groups, 0..79 rows each, value = a
  // fixed permutation so heaps actually reorder; (g, id) is a total key.
  private lazy val data = {
    import spark.implicits._
    (0 until 40).flatMap { g =>
      (0 until (g * 2)).map { i =>
        (g, (i * 7919 + g * 31) % 1000, i)
      }
    }.toDF("g", "score", "id")
  }

  /** The un-rewritten window formulation as an independent oracle: with
    * the RowNumberTopKRewrite active, the idiom itself plans through
    * GroupedTopK — the comparisons below must disable it or they'd
    * compare the operator to itself. */
  private def withoutRewrite[A](body: => A): A = {
    spark.conf.set("spark.graft.topk.rewrite", "false")
    try body finally spark.conf.unset("spark.graft.topk.rewrite")
  }

  test("matches the row_number window formulation, including k > group size") {
    val k = 5
    val got = GroupedTopK.topK(data, Seq("g"), k,
        col("score").asc, col("id").asc)
      .orderBy("g", "score", "id").collect().toSeq
    val w = Window.partitionBy("g").orderBy(col("score").asc, col("id").asc)
    val want = withoutRewrite {
      data.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= k).drop("_rn")
        .orderBy("g", "score", "id").collect().toSeq
    }
    assert(got == want)
    // groups smaller than k return every row (g=1 has 2 rows)
    assert(got.count(_.getInt(0) == 1) == 2)
    // absent group stays absent (g=0 generated no rows)
    assert(!got.exists(_.getInt(0) == 0))
  }

  test("descending order and multi-column grouping") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 10.0), ("a", 1, 30.0), ("a", 1, 20.0),
      ("a", 2, 5.0), ("b", 1, 7.0), ("b", 1, 6.0))
      .toDF("k1", "k2", "v")
    val got = GroupedTopK.topK(df, Seq("k1", "k2"), 2, col("v").desc)
      .orderBy("k1", "k2", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 1, 20.0), ("a", 1, 30.0),
      ("a", 2, 5.0), ("b", 1, 6.0), ("b", 1, 7.0)))
  }

  test("plan: two-phase exec around one exchange, no window, no sort") {
    val plan = GroupedTopK.topK(data, Seq("g"), 3, col("score").asc,
      col("id").asc)
    plan.collect() // force AQE finalization
    val executed = plan.queryExecution.executedPlan
    val topks = collect(executed) { case e: GroupedTopKExec => e }
    assert(topks.map(_.partial).sorted == Seq(false, true),
      s"want partial+final, got:\n$executed")
    val shuffles = collect(executed) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size == 1, s"want exactly 1 exchange, got:\n$executed")
    assert(collect(executed) { case w: WindowExec => w }.isEmpty)
    // metrics: the partial phase must emit no more than groups×k ≪ input
    val partial = topks.find(_.partial).get
    val partialOut = partial.metrics("numOutputRows").value
    val nGroups = 39 // g ∈ 1..39 generate rows
    assert(partialOut > 0 && partialOut <= nGroups.toLong * 3 * 4,
      s"partial emitted $partialOut rows") // ≤ groups×k×partitions
    assert(partialOut < data.count(), "partial phase did not reduce rows")
  }

  test("null group keys and null order values match the window semantics") {
    import spark.implicits._
    val df = Seq[(Option[String], Option[Int], Int)](
      (None, Some(3), 1), (None, Some(1), 2), (None, None, 3),
      (Some("g"), None, 4), (Some("g"), Some(2), 5), (Some("g"), None, 6))
      .toDF("g", "score", "id")
    val got = GroupedTopK.topK(df, Seq("g"), 2,
        col("score").asc_nulls_last, col("id").asc)
      .orderBy(col("g").asc_nulls_first, col("score").asc_nulls_last, col("id"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getInt(2))).toSeq
    val w = Window.partitionBy("g")
      .orderBy(col("score").asc_nulls_last, col("id").asc)
    val want = withoutRewrite {
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 2).drop("_rn")
        .orderBy(col("g").asc_nulls_first, col("score").asc_nulls_last, col("id"))
        .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getInt(2))).toSeq
    }
    assert(got == want)
    // the null group is a real group with its own top-2
    assert(got.count(_._1.isEmpty) == 2)
  }

  test("partial flush keeps results correct when group count exceeds the cap") {
    spark.conf.set("spark.graft.topk.maxPartialGroups", "4")
    try {
      val got = GroupedTopK.topK(data, Seq("g"), 2,
          col("score").asc, col("id").asc)
        .orderBy("g", "score", "id").collect().toSeq
      val w = Window.partitionBy("g").orderBy(col("score").asc, col("id").asc)
      val want = withoutRewrite {
        data.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= 2).drop("_rn")
          .orderBy("g", "score", "id").collect().toSeq
      }
      assert(got == want)
    } finally spark.conf.unset("spark.graft.topk.maxPartialGroups")
  }

  test("row_number<=k filter idiom rewrites to GroupedTopK; rank does not") {
    import spark.implicits._
    val w = Window.partitionBy("g").orderBy(col("score").asc, col("id").asc)
    // DataFrame form
    val idiom = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val planned = collectFirst(idiom.queryExecution.executedPlan) {
      case e: GroupedTopKExec => e
    }
    assert(planned.nonEmpty, "rewrite did not fire on the row_number idiom:\n" +
      idiom.queryExecution.executedPlan)
    // results identical to the un-rewritten window plan, rank values intact
    val got = idiom.orderBy("g", "score", "id").collect().toSeq
    val want = withoutRewrite {
      data.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("g", "score", "id").collect().toSeq
    }
    assert(got == want)

    // SQL text form — the path a plain spark.sql user hits
    data.createOrReplaceTempView("topk_src")
    val sql = spark.sql(
      """SELECT * FROM (
        |  SELECT g, score, id,
        |         row_number() OVER (PARTITION BY g ORDER BY score, id) AS rn
        |  FROM topk_src) WHERE rn = 1""".stripMargin)
    assert(collectFirst(sql.queryExecution.executedPlan) {
      case e: GroupedTopKExec => e
    }.nonEmpty, "rewrite did not fire on the SQL form")
    assert(sql.count() == data.select("g").distinct().count())

    // rank() can exceed k rows on ties — must NOT rewrite
    val ranked = data.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    assert(collectFirst(ranked.queryExecution.executedPlan) {
      case e: GroupedTopKExec => e
    }.isEmpty, "rank() idiom must not rewrite")
  }
}
