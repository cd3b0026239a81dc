package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — SURVEY §4.2's physical knob for the
  * repeated J1/J3 joins: bucketing `phot` by its join key lets every
  * subsequent equi-join on that key skip its shuffle entirely. The spec
  * proves the property on the physical plan: the bucketed self-join has
  * NO Exchange on either side, the unbucketed one shuffles both. */
class CoLocatedJoinSpec extends SparkSpecBase {

  test("bucketed self-join runs with zero exchanges; unbucketed shuffles") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    val t = spark.table("li_bucketed")

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning"))

    val bucketedJoin = t.as("a").join(t.as("b"), "l_orderkey")
    val plainJoin = li.as("a").join(li.as("b"), "l_orderkey")

    // AQE folds small sides into broadcasts; force the shuffle strategy so
    // the bucketing property itself is what's measured.
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(exchanges(bucketedJoin) == 0,
        bucketedJoin.queryExecution.executedPlan.toString)
      assert(exchanges(plainJoin) >= 2,
        plainJoin.queryExecution.executedPlan.toString)
      // and the co-located join still computes the right thing
      val n = bucketedJoin.filter(col("a.l_linenumber") === 1 &&
        col("b.l_linenumber") === 2).count()
      val m = plainJoin.filter(col("a.l_linenumber") === 1 &&
        col("b.l_linenumber") === 2).count()
      assert(n == m && n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
    }
  }
}
