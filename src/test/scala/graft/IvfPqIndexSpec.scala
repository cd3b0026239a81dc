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
}
