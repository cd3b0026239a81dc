package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named declared queries to
  * `<outDir>/<query>_<suffix>.txt` — the per-round optimization evidence
  * (`plans/rNN/<query>_before.txt` / `..._after.txt`). The query is
  * EXECUTED first (noop sink) so AQE finalizes and the printed plan is
  * the shape that actually ran, not the `isFinalPlan=false` draft.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,..>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, qcsv) = args
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.local()
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      // graph queries eagerly materialize-and-release; dump their
      // PRE-finish plan (the registered one is a checkpoint scan)
      val df = graft.operators.GraphQueries.planOnly
        .getOrElse(name, graft.SparkEntry.queries(name))(spark, sfDir)
      spark.sparkContext.setJobDescription(s"explain: $name")
      df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val p = Paths.get(outDir, s"${name}_$suffix.txt")
      Files.write(p, txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explain] wrote $p (${txt.length} chars)")
      graft.operators.Graph.release(df)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
