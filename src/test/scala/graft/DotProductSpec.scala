package graft

import graft.functions.{DotProduct, VectorKernels}
import org.apache.spark.sql.functions._

/** The native codegen dot-product must be BIT-identical to the compiled
  * UDF (and thus to the DuckDB oracle fragment) — same left-to-right
  * double accumulation, elementwise float→double casts. */
class DotProductSpec extends SparkSpecBase {

  test("native expression equals the UDF bit-for-bit on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (i.toLong,
       Array.fill(64)(rnd.nextFloat() * 2f - 1f),
       Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("dot_native", DotProduct.dot(col("a"), col("b")))
      .withColumn("dot_udf", VectorKernels.dotUdf(col("a"), col("b")))
      .withColumn("norm_native", DotProduct.norm(col("a")))
      .withColumn("norm_udf", VectorKernels.normUdf(col("a")))
    val got = df.select("dot_native", "dot_udf", "norm_native", "norm_udf")
      .collect()
    got.foreach { r =>
      // exact ==, not tolerance: same IEEE expression tree
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("graft_dot is registered in SQL via the session extensions") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val sql = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").collect()
    assert(sql.head.getDouble(0) == 32.0)
    val api = df.select(DotProduct.dot(col("a"), col("b"))).collect()
    assert(sql.head.getDouble(0) == api.head.getDouble(0))
  }

  test("length mismatch truncates to the shorter side; nulls propagate") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f)),
      (Array(2f, 2f), Array(3f, 3f, 3f)))
      .toDF("a", "b")
      .withColumn("d", DotProduct.dot(col("a"), col("b")))
    assert(df.select("d").collect().map(_.getDouble(0)).toSeq ==
      Seq(14.0, 12.0))
    val withNull = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .withColumn("d", DotProduct.dot(col("a"), col("b")))
    assert(withNull.select("d").collect()(0).isNullAt(0))
  }

  test("whole-stage codegen stays enabled around the expression") {
    // a real scan (a local relation constant-folds before codegen)
    val df = Tables.embeddings(spark, sfDir)
      .withColumn("d", DotProduct.dot(col("embedding"), col("embedding")))
      .filter(col("d") > 0)
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen stage;
    // the expression must appear INSIDE such a stage, not break it.
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("dotproduct")), plan)
    assert(df.count() > 0) // and the generated code actually runs
  }
}
