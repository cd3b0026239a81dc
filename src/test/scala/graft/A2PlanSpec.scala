package graft

/** Pins a2's aggregate-pass plan (fresh scan + hash aggregate per clip
  * pass, bounds as literal predicates — ZERO fact-table exchanges) to
  * the window formulation it replaced (one exchange+sort of the whole
  * fact table). The rewrite exists because at 100 TB a full-corpus
  * shuffle+sort to compute six groups' statistics is the wrong plan;
  * the survivor sets and every emitted double must not move. */
class A2PlanSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("a2 aggregate-pass plan == window plan, bit-exact") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val agg = rows(graft.operators.Statistical.a2ByAggregate(spark, dir))
      val win = rows(graft.operators.Statistical.a2ByWindow(spark, dir))
      assert(agg == win, s"a2 plans diverge at $dir")
      assert(agg.nonEmpty)
    }
  }
}
