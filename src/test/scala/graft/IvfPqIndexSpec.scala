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

  test("concurrent ensures build once; both observe only the complete index") {
    val parent = java.nio.file.Files.createTempDirectory("ivfpq_race")
    val path = parent.toString + "/graft_ivfpq_racetest"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // two sessions racing ensure on the same not-yet-built index: the
    // monitor+file-lock must serialize them — one builds, the other
    // waits and reads the promoted result; neither sees a partial dir
    val calls = Seq(
      Future(graft.operators.IvfPqIndex.ensureAt(spark, sfDir, path)),
      Future(graft.operators.IvfPqIndex.ensureAt(spark, sfDir, path)))
    val got = Await.result(Future.sequence(calls), 5.minutes)
    assert(got.forall(_ == path))
    val marker = new java.io.File(path, "_INDEX_SUCCESS")
    assert(marker.exists())
    // a complete index: every table present, lists exactly corpus-sized
    // (a double-build racing into one dir would double or corrupt them)
    Seq("coarse_centroids", "lists", "pq_codebooks", "pq_codes").foreach { t =>
      assert(new java.io.File(path, t).exists(), s"missing index table $t")
    }
    val n = Tables.embeddings(spark, sfDir).count()
    assert(spark.read.parquet(s"$path/lists").count() == n)
    assert(spark.read.parquet(s"$path/pq_codes").count() == n * 4)
    // third ensure: already complete, no rebuild
    val stamp = marker.lastModified
    assert(graft.operators.IvfPqIndex.ensureAt(spark, sfDir, path) == path)
    assert(marker.lastModified == stamp)
  }

  test("external query vectors (absent from corpus) search without ingestion") {
    val idx = IvfPqIndex.ensure(spark, sfDir)
    // a synthetic query: vector 7's embedding under an id the corpus has
    // never seen — the OLD rerank fetched query embeddings by joining
    // query_id into the corpus, which returns zero rows for this id, so
    // this test is the decoupling proof, not just a smoke check
    val donor = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 7).select("vec_id", "embedding")
    val external = donor.select(lit(900001L).as("vec_id"), col("embedding"))
    val corpus = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val r = IvfPqIndex.probeRefined(spark, idx, external, corpus,
        candK = 10, topk = 3, excludeSelf = false)
      .orderBy("rank").collect()
    assert(r.length == 3, s"expected top-3 for the external query, got ${r.length}")
    // exact rerank must put the byte-identical donor first, cos ≈ 1
    assert(r.head.getLong(2) == 7L, r.mkString("; "))
    assert(math.abs(r.head.getDouble(3) - 1.0) < 1e-6)
  }

  test("fingerprint tracks content; superseded index dirs are swept on promote") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // two corpora, same file NAME and LENGTH, one data byte apart → the
    // (path,length,mtime) key this replaces could not tell them apart
    val c1 = Files.createTempDirectory("ivfpq_fp1")
    val src = Paths.get(sfDir, "embeddings.parquet")
    Files.copy(src, c1.resolve("embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val bytes = Files.readAllBytes(src)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 1).toByte
    val c2 = Files.createTempDirectory("ivfpq_fp2")
    Files.write(c2.resolve("embeddings.parquet"), bytes)
    val d1 = IvfPqIndex.indexDir(c1.toString)
    val d2 = IvfPqIndex.indexDir(c2.toString)
    assert(d1 != d2, "content change did not move the fingerprint")
    // same content at a different path also gets its own dir (the tag
    // includes the absolute source path)
    assert(IvfPqIndex.indexDir(sfDir) != d1)

    // GC: promote under a NEW fingerprint for the same source sweeps the
    // old fingerprint's dir (otherwise every regeneration leaks one)
    val parent = Files.createTempDirectory("ivfpq_gc")
    val old = parent.toString + "/graft_ivfpq_oldfp"
    val neu = parent.toString + "/graft_ivfpq_newfp"
    graft.operators.IvfPqIndex.ensureAt(spark, c1.toString, old)
    assert(new java.io.File(old, "_INDEX_SUCCESS").exists())
    graft.operators.IvfPqIndex.ensureAt(spark, c1.toString, neu)
    assert(new java.io.File(neu, "_INDEX_SUCCESS").exists())
    assert(!new java.io.File(old).exists(),
      "superseded fingerprint dir for the same source was not swept")
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

  test("remove drops ids from lists and codes; probe forgets them; tombstones replay safely") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_remove")
      .toString + "/idx"
    IvfPqIndex.build(spark, sfDir, tmp)
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 3)
      .select("vec_id", "embedding")
    val before = IvfPqIndex.probe(spark, tmp, q, topk = 3).collect()
    assert(before.nonEmpty)
    val victim = before.head.getLong(2) // its top neighbor

    import spark.implicits._
    val tombstones = Seq(victim, 888888L).toDF("vec_id") // one absent id
    IvfPqIndex.remove(spark, tmp, tombstones)
    IvfPqIndex.remove(spark, tmp, tombstones) // replayed batch: no-op

    assert(spark.read.parquet(s"$tmp/lists")
      .filter(col("vec_id") === victim).count() == 0)
    assert(spark.read.parquet(s"$tmp/pq_codes")
      .filter(col("vec_id") === victim).count() == 0)
    val after = IvfPqIndex.probe(spark, tmp, q, topk = 3).collect()
    assert(!after.exists(_.getLong(2) == victim),
      "removed id still served as a neighbor")
    assert(after.length == before.length, "k no longer filled after delete")
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
