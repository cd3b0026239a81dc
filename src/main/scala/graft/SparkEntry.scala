package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names carry the SURVEY.md §2 operator IDs they realize (j2 = pair
  * self-join, a5 = epoch sessionization, …). Each pack pairs the Spark
  * pipeline with equivalent DuckDB SQL; queries whose semantics ANSI SQL
  * can't express are registered without an oracle (rows-only check).
  */
object SparkEntry {

  private[graft] val packs: Seq[QueryPack] = Seq(
    operators.Relational,
    operators.WindowedScalar,
    operators.Statistical,
    operators.TextAnalysis,
    operators.Dedup,
    operators.Similarity,
    operators.MergeStream,
    operators.Multimodal,
    operators.Spatial,
    operators.Skew,
    operators.Sketch,
    operators.GraphQueries,
    operators.CorpusCuration)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
