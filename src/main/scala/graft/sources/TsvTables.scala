package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Header-prefixed TSV sources and sinks — the reference's `.cat`/`.coo`/
  * slopes/coeffs text tables (SURVEY.md §2.1 S3/S6;
  * /root/reference/wfc3_cte_monitor/database_update.py:356-362,
  * database_reset.py:322-328).
  *
  * The reference reads these with `astropy.ascii` (positional `col1…colN`
  * or named headers, '#' comments); writes are tab-separated with a
  * header line. Spark's CSV source covers the dialect directly — schema
  * applied on read so the files scan in parallel with column pruning.
  */
object TsvTables {

  /** Read a '#'-commented TSV with an explicit schema (no header line —
    * positional columns like the reference's .cat files). */
  def readPositional(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("comment", "#")
      .schema(schema)
      .csv(path)

  /** Read a TSV whose first line is a header. */
  def readNamed(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("comment", "#")
      .schema(schema)
      .csv(path)

  /** Write a headered TSV. `single = true` coalesces to one file for the
    * reference's one-file-per-artifact layout (fine for small derived
    * tables; large tables keep their parallelism). */
  def write(df: DataFrame, path: String, single: Boolean = true): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)
  }
}
