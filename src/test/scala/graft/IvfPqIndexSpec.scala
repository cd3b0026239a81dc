package graft

import org.apache.spark.sql.functions._

/** The build-once/probe-many contract of the persisted IVF-PQ index:
  * ensure() is idempotent (no rebuild on second touch), probe is
  * deterministic, and — the serving property — a probe against the index
  * never scans the corpus embeddings parquet. */
class IvfPqIndexSpec extends SparkSpecBase {
  import graft.operators.IvfPqIndex

  test("index builds once; probe is deterministic and corpus-scan-free") {
    val dir = IvfPqIndex.ensure(spark, sfDir)
    val marker = new java.io.File(dir, "_INDEX_SUCCESS")
    assert(marker.exists())
    Seq("coarse_centroids", "lists", "pq_codebooks", "pq_codes").foreach { t =>
      assert(new java.io.File(dir, t).exists(), s"missing index table $t")
    }
    val stamp = marker.lastModified
    assert(IvfPqIndex.ensure(spark, sfDir) == dir)
    assert(marker.lastModified == stamp, "second ensure() rebuilt the index")

    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
      .select("vec_id", "embedding")
    val r1 = IvfPqIndex.probe(spark, dir, q).orderBy("query_id", "rank").collect()
    val r2 = IvfPqIndex.probe(spark, dir, q).orderBy("query_id", "rank").collect()
    assert(r1.nonEmpty && r1.sameElements(r2))
    val byQuery = r1.groupBy(_.getLong(0))
    assert(byQuery.size == 5 && byQuery.values.forall(_.length == 3))
    // ADC is a sum of squared distances — non-negative up to float rounding
    assert(r1.forall(_.getDouble(3) > -1e-9))

    // serving property: with literal query vectors the probe plan reads
    // ONLY the index tables — the corpus parquet must not appear
    val litQ = spark.createDataFrame(
      spark.sparkContext.parallelize(q.collect().toSeq), q.schema)
    val probeDf = IvfPqIndex.probe(spark, dir, litQ)
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"), plan.take(2000))
    assert(probeDf.orderBy("query_id", "rank").collect().sameElements(r1))
  }

  test("append encodes with existing quantizers and upserts by key") {
    import org.apache.spark.sql.functions._
    // scratch copy: appending into the fingerprint-keyed dir would
    // poison v13's oracle for later runs in this JVM
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_append")
      .toString + "/idx"
    IvfPqIndex.build(spark, sfDir, tmp)
    val lists0 = spark.read.parquet(s"$tmp/lists").count()
    val codes0 = spark.read.parquet(s"$tmp/pq_codes").count()

    // one clone of an existing vector under a new id (must encode to the
    // donor's cell and codes) + a re-append of the donor itself (upsert
    // idempotence: no row growth for it)
    val donor = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 7).select("vec_id", "embedding")
    val clone = donor.select(lit(900001L).as("vec_id"), col("embedding"))
    IvfPqIndex.append(spark, tmp, clone.unionByName(donor))

    val lists1 = spark.read.parquet(s"$tmp/lists")
    val codes1 = spark.read.parquet(s"$tmp/pq_codes")
    assert(lists1.count() == lists0 + 1)
    assert(codes1.count() == codes0 + 4) // pqM code rows for the clone only
    val cellOf = lists1.filter(col("vec_id").isin(7L, 900001L))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellOf(900001L) == cellOf(7L))
    val codeOf = codes1.filter(col("vec_id").isin(7L, 900001L))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    (0 until 4).foreach { j =>
      assert(codeOf((900001L, j)) == codeOf((7L, j)), s"subspace $j")
    }
  }

  test("streaming maintenance appends each micro-batch exactly once") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("ivfpq_stream")
    val landing = root.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val idx = root.toString + "/idx"
    IvfPqIndex.build(spark, sfDir, idx)
    val lists0 = spark.read.parquet(s"$idx/lists").count()

    val donors = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 3)
      .select("vec_id", "embedding")
    def drop(name: String, idOffset: Long): Unit =
      donors.select((col("vec_id") + idOffset).as("vec_id"), col("embedding"))
        .coalesce(1).write.mode("overwrite")
        .parquet(landing.resolve(name).toString)

    drop("b1", 800000L)
    val schema = spark.read.parquet(landing.resolve("b1").toString).schema
    val q = IvfPqIndex.maintain(
      spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(landing.toString), idx)
    q.processAllAvailable()
    assert(spark.read.parquet(s"$idx/lists").count() == lists0 + 3)

    drop("b2", 800000L) // redelivery of the same ids: upsert, no growth
    q.processAllAvailable()
    drop("b3", 810000L) // genuinely new ids
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$idx/lists").count() == lists0 + 6)
    // codes stay in lockstep: pqM rows per indexed vector
    assert(spark.read.parquet(s"$idx/pq_codes").count() == (lists0 + 6) * 4)
  }
}
