package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Warm the JVM/codegen on EVERY query once at the smallest SF so the
    // timed pass measures the engine, not first-call classloading or
    // whole-stage-codegen compilation (those costs are per-plan-shape and
    // would otherwise land on whichever query runs them first). The warm
    // dir is derived from the bench dir (sibling sf0.001) unless
    // overridden, and warm-up failures are LOUD: a missing warm dir would
    // silently shift codegen cost back into the timed pass.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      new java.io.File(sfDir).getParent + "/sf0.001")
    var warmFailed = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        warmFailed += 1
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }
    if (warmFailed > 0)
      System.err.println(s"[bench] $warmFailed warm-up failures from $warmDir" +
        " — timed pass includes first-call codegen for those queries")
    spark.catalog.clearCache()
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes every row/column (count() would let Spark
      // skip projections); this is the honest full-query cost.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // A throwing query must NOT silently record a near-zero time as a
        // pass — track it and surface the failure in the JSON + exit code.
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      // Queries may persist intermediates (signature tables); drop them so
      // one query's cache never skews the next one's measurement.
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
