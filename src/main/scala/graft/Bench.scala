package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

object Bench {
  /** Queries slower than this get median-of-3 timing: at 4-8 s a single
    * run can't distinguish a real regression from JVM/GC variance (the
    * r3→r4 a2/t4 confusion). Cheap queries stay single-run to keep the
    * bench wall-time bounded. */
  private val repeatThresholdSec = 2.0

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
      try {
        val df = fn(spark, warmDir)
        df.write.format("noop").mode("overwrite").save()
        graft.operators.Graph.release(df)
      } catch { case e: Throwable =>
        warmFailed += 1
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }
    if (warmFailed > 0)
      System.err.println(s"[bench] $warmFailed warm-up failures from $warmDir" +
        " — timed pass includes first-call codegen for those queries")
    spark.catalog.clearCache()

    var failed = List.empty[String]
    // noop sink materializes every row/column (count() would let Spark
    // skip projections); this is the honest full-query cost. After each
    // run, query-local persisted tables AND localCheckpoint blocks are
    // dropped so one query's cache never skews the next measurement.
    def runOnce(name: String, fn: (SparkSession, String) => DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val r = try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Graph.release(df)
        Some(dt)
      } catch { case e: Throwable =>
        // A throwing query must NOT silently record a near-zero time as a
        // pass — track it and surface the failure in the JSON + exit code.
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        None
      }
      spark.catalog.clearCache()
      r
    }

    val stats = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Double, Int)]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      runOnce(name, fn).map { first =>
        val times =
          if (first > repeatThresholdSec)
            first :: List.fill(2)(runOnce(name, fn)).flatten
          else List(first)
        val sorted = times.sorted
        val median = sorted(sorted.size / 2)
        stats(name) = (median, sorted.head, sorted.last, times.size)
        name -> median
      }
    }.toMap

    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val statsJson = stats.toSeq.sortBy(_._1).map { case (k, (med, mn, mx, n)) =>
      s"""\"$k\":{"median":$med,"min":$mn,"max":$mx,"runs":$n}"""
    }.mkString("{", ",", "}")
    val fl = failed.distinct.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // v6 retrains its IVF index in-query; v13 probes a persisted one. The
    // pair pins how much of v6's time is training vs search.
    val note = (results.get("v6_ivf_topk"), results.get("v13_ivf_pq_probe")) match {
      case (Some(a), Some(b)) =>
        s""","notes":{"v6_train_plus_probe_sec":$a,"v13_probe_only_sec":$b}"""
      case _ => ""
    }
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stats":$statsJson,"failed":$fl,"sf":"$sfDir"$note}"""
    println(json)
    // The driver's log capture truncates long stdout tails (BENCH_r05
    // preserved only 63/92 per-query times); the file is the durable,
    // always-whole record of the same JSON object.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_results.json")
    try Files.writeString(Paths.get(out), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
