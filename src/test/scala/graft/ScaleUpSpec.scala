package graft

import org.apache.spark.sql.functions._

/** tools/ScaleUp is the scale-headroom instrument (SCALE_HEADROOM.md) —
  * its output must be a FAITHFUL enlargement or the headroom numbers
  * measure a different workload: row counts scale by the factor,
  * referential integrity survives the key shifts, fixed dimensions stay
  * fixed, and document replicas are near- but not exact dups. */
class ScaleUpSpec extends SparkSpecBase {

  test("2x scale-up preserves counts, FK integrity, and dup structure") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_scaleup").toString
    tools.ScaleUpCore.run(spark, sfDir, out, factor = 2)
    def cnt(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()

    // factor-scaled tables double; fixed dimensions do not
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(cnt(out, t) == 2 * cnt(sfDir, t), s"$t row count")
    for (t <- Seq("region", "nation"))
      assert(cnt(out, t) == cnt(sfDir, t), s"$t must stay fixed-size")

    // FK integrity after the per-table key shifts
    val orders = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    assert(orders.join(cust, orders("o_custkey") === cust("c_custkey"),
      "left_anti").count() == 0, "orphan o_custkey")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    assert(li.join(orders, li("l_orderkey") === orders("o_orderkey"),
      "left_anti").count() == 0, "orphan l_orderkey")
    val supp = spark.read.parquet(s"$out/supplier.parquet")
    assert(li.join(supp, li("l_suppkey") === supp("s_suppkey"),
      "left_anti").count() == 0, "orphan l_suppkey")

    // documents: ids unique, replicas tagged (near-dups, never exact),
    // n_chars consistent with the perturbed text
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    assert(docs.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count() == 0,
      "replicas must not be byte-identical")
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
  }
}
