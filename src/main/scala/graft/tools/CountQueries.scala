package graft.tools

/** Build-time sanity util: prints the registered query/oracle counts and
  * any query lacking an oracle (used by COVERAGE.md bookkeeping). */
object CountQueries {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"QUERIES=${q.size} ORACLES=${o.size}")
    val noOracle = q -- o
    if (noOracle.nonEmpty)
      println(s"NO_ORACLE=${noOracle.toSeq.sorted.mkString(",")}")
    val orphan = o -- q
    if (orphan.nonEmpty)
      println(s"ORPHAN_ORACLE=${orphan.toSeq.sorted.mkString(",")}")
  }
}
