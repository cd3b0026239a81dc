package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage cost attribution for c1_curation_funnel (guide §1.5): runs
  * the exact stage sequence c1CurationFunnel runs — same persists, same
  * counts, same unpersist points — but times each stage's materializing
  * action separately. Diagnostic only; c1's declared query is untouched.
  *
  * Usage: runMain graft.tools.C1Stages <sfDir> [reps]
  */
object C1Stages {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: C1Stages <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local()
    import graft.operators.CorpusCuration._
    val cfg = Config()

    def timed[A](label: String)(body: => A): (String, Double) = {
      spark.sparkContext.setJobDescription(s"c1 stage: $label")
      val t0 = System.nanoTime()
      body
      (label, (System.nanoTime() - t0) / 1e9)
    }

    for (rep <- 1 to reps) {
      val all = graft.Tables.documents(spark, dir)
      val heldOut = all.filter(col("doc_id") % 7 === 0)
      val docs = all.filter(col("doc_id") % 7 =!= 0).persist()
      val t0 = timed("input count")(docs.count())
      val q = qualityStage(docs, cfg).persist()
      val t1 = timed("quality")(q.count())
      docs.unpersist(blocking = false)
      val e = exactDedupStage(q).persist()
      val t2 = timed("exact dedup")(e.count())
      q.unpersist(blocking = false)
      val n = nearDedupStage(e, cfg).persist()
      val t3 = timed("near dedup")(n.count())
      e.unpersist(blocking = false)
      val c = decontamStage(n, heldOut, cfg).persist()
      val t4 = timed("decontam")(c.count())
      n.unpersist(blocking = false)
      val sm = sampleStage(c, cfg).persist()
      val t5 = timed("sample")(sm.count())
      c.unpersist(blocking = false)
      val t6 = timed("chunk count")(chunkStage(sm, cfg).count())
      sm.unpersist(blocking = false)
      val stages = Seq(t0, t1, t2, t3, t4, t5, t6)
      val total = stages.map(_._2).sum
      println(f"[c1stages] rep $rep total $total%.2f s :: " +
        stages.map { case (l, s) => f"$l=$s%.2f" }.mkString(" "))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
