package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; no schema
  * is forced. The corpus is REGENERATED between rounds and its physical
  * types have drifted before (events.ts shipped as both nanos-as-int64
  * and native TIMESTAMP(MICROS)), so every load runs a schema check
  * against the recorded expectation: a KNOWN drift is adapted in place
  * (the events.ts dispatch below), an UNKNOWN one logs a single named
  * warning per (dir, table) — the next regeneration surfaces here as
  * "schema drift in lineitem: l_quantity expected double, got X" instead
  * of as a DATATYPE_MISMATCH fifteen queries deep in some consumer.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Acceptable read-back Spark types per column (simpleString), as of
    * the round-8 corpus. A set per column: every entry is a generation
    * the loaders are known to handle. Date-ish columns accept all three
    * timestamp generations the corpus has shipped. */
  private val tsGen = Set("timestamp", "timestamp_ntz", "bigint")
  private[graft] val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> tsGen, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> tsGen),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> tsGen,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Named-diff schema check, warning-only (queries keep running — the
    * point is a precise first signal, not a new failure mode). Returns
    * the drift lines so specs can assert on them. */
  private[graft] def schemaDrift(name: String,
      schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    val exp = expected(name)
    val actual = schema.fields.map(f =>
      f.name -> f.dataType.simpleString).toMap
    val missing = exp.collect {
      case (c, _) if !actual.contains(c) => s"$c missing"
    }
    val changed = exp.collect {
      case (c, ok) if actual.contains(c) && !ok(actual(c)) =>
        s"$c expected ${ok.mkString("|")}, got ${actual(c)}"
    }
    val extra = (actual.keySet -- exp.map(_._1)).toSeq.sorted
      .map(c => s"$c unexpected (${actual(c)})")
    missing ++ changed ++ extra
  }

  private def checkSchema(sfDir: String, name: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val drift = schemaDrift(name, schema)
    if (drift.nonEmpty && warned.add(s"$sfDir/$name"))
      System.err.println(
        s"[tables] schema drift in $sfDir/$name: ${drift.mkString("; ")}")
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      // Older corpus generations wrote events.ts as parquet TIMESTAMP(NANOS),
      // which Spark can only read as a long (nanos since epoch) under the
      // nanosAsLong legacy conf; newer generations write a native
      // TIMESTAMP(MICROS) (NTZ) column. Dispatch on the type the file reads
      // back as, normalizing to TimestampType either way: nanos-longs are
      // down-converted with integer division (nanos exceed 2^53, so no
      // double round-trip), and NTZ is a lossless reinterpretation under the
      // UTC session timezone GraftSession pins. TimestampType (not NTZ) is
      // required for streaming watermarks downstream.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      checkSchema(sfDir, name, raw.schema)
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      checkSchema(sfDir, name, raw.schema)
      raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
