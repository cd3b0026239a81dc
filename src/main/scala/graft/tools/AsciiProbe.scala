package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway semantics probe: what exactly does the expr-based polyhash
  * (split('') + ascii fold) produce on non-ASCII input? Pins the target
  * for a native replacement. */
object AsciiProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local()
    import s.implicits._
    val tests = Seq("", "a", "abc", "héllo", "日本",
      "a😀b", "tab\tnl\n", " x ")
    val df = tests.toDF("t")
    df.select(col("t"),
      expr(graft.functions.TextPrims.polyhash("t",
        graft.functions.TextPrims.SparkD)).as("ph"),
      expr("transform(filter(split(t, ''), c -> c <> ''), " +
        "c -> CAST(ascii(c) AS BIGINT))").as("chars"))
     .collect().foreach { r =>
       val hex = r.getString(0).map(c => f"u${c.toInt}%04x").mkString(" ")
       println(s"PROBE [$hex] ph=${r.getLong(1)} " +
         s"chars=${r.getSeq[Long](2).mkString(",")}")
     }
    s.stop()
  }
}
