package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Schema-drift guard for the corpus loaders (VERDICT r7 task 3): the
  * driver has regenerated `events.parquet` with different on-disk `ts`
  * encodings across rounds (nanos-as-int64, then native TIMESTAMP(MICROS)
  * read back as TIMESTAMP_NTZ). `Tables.events` must normalize every
  * generation to the same TimestampType column with identical values, so
  * downstream sessionization / windows / watermarks never see the drift.
  */
class TablesSpec extends SparkSpecBase {

  // One logical corpus, three physical encodings of the same instants.
  private val microsValues = Seq(
    1696118400000000L,            // 2023-10-01 00:00:00 UTC
    1696118461500000L,            // +61.5s
    1696122061123456L)            // odd micros remainder

  private def writeCorpus(tsEncoding: String): String = {
    val dir = Files.createTempDirectory(s"graft_tables_$tsEncoding").toString
    import spark.implicits._
    val base = microsValues.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
    val withTs = tsEncoding match {
      case "int64_nanos" =>
        base.withColumn("ts", col("us") * 1000L)
      case "timestamp_ntz" =>
        base.withColumn("ts",
          timestamp_micros(col("us")).cast(TimestampNTZType))
      case "timestamp_ltz" =>
        base.withColumn("ts", timestamp_micros(col("us")))
    }
    withTs.select("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadNormalized(dir: String) =
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSeq

  test("events loader normalizes all ts generations to identical values") {
    val encodings = Seq("int64_nanos", "timestamp_ntz", "timestamp_ltz")
    val results = encodings.map { enc =>
      val dir = writeCorpus(enc)
      val loaded = loadNormalized(dir)
      val tsType = Tables.events(spark, dir).schema("ts").dataType
      assert(tsType == TimestampType,
        s"$enc: loader must yield TimestampType, got $tsType")
      enc -> loaded
    }.toMap
    val expected = microsValues.indices.map(i => (i.toLong, microsValues(i)))
    results.foreach { case (enc, loaded) =>
      assert(loaded == expected, s"$enc: values drifted: $loaded")
    }
  }

  test("schema check: clean on the real corpus, names every drift kind") {
    // the shipped corpus matches the recorded expectation for all tables
    Tables.names.foreach { t =>
      val raw = spark.read.parquet(s"$sfDir/$t.parquet")
      assert(Tables.schemaDrift(t, raw.schema).isEmpty,
        s"$t drifted: ${Tables.schemaDrift(t, raw.schema)}")
    }
    // a drifted schema yields one named line per problem
    val drifted = StructType(Seq(
      StructField("l_orderkey", StringType),  // changed type
      StructField("l_partkey", LongType),
      StructField("surprise", IntegerType)))  // extra; everything else missing
    val lines = Tables.schemaDrift("lineitem", drifted)
    assert(lines.exists(_.contains("l_orderkey expected bigint, got string")))
    assert(lines.exists(_ == "l_quantity missing"))
    assert(lines.exists(_.contains("surprise unexpected")))
  }

  test("loader rejects unknown tables, passes the rest through untouched") {
    intercept[IllegalArgumentException] {
      Tables.load(spark, sfDir, "nope")
    }
    // Non-events tables keep their on-disk schema verbatim.
    val direct = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
    assert(Tables.lineitem(spark, sfDir).schema == direct)
  }
}
