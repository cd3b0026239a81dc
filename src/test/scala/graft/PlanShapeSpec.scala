package graft

import org.apache.spark.sql.functions._

/** Guards on the physical-plan properties the engine's scale story relies
  * on: predicate pushdown and column pruning reaching the parquet scans,
  * no forced broadcast of fact-sized join sides, and partition pruning on
  * the hive-partitioned CTE warehouse. These are the properties a 100×
  * scale-up depends on — a regression here is invisible to row-level
  * correctness checks. */
class PlanShapeSpec extends SparkSpecBase {

  private def executedPlan(name: String): String =
    // graph queries materialize-and-release eagerly; pin their PRE-finish
    // plan (the registered one is just a checkpoint scan)
    operators.GraphQueries.planOnly
      .getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("s1: filters are pushed to the scan and the schema is pruned") {
    val plan = executedPlan("s1_scan_filter_project")
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("IsNotNull(l_shipdate)") ||
           plan.contains("GreaterThanOrEqual(l_shipdate"))
    // only the 5 projected + 3 filter-only columns may be read — the wide
    // rest of lineitem (discount, tax, comment, …) must not appear.
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"))
    assert(!readSchema.contains("l_discount"))
  }

  test("j1: no forced broadcast — strategy degrades to shuffle when stats say big") {
    // With the auto-broadcast threshold off, the fact-to-fact join must
    // plan as a shuffled join; a forced broadcast() hint on orders would
    // ignore the threshold and keep a BroadcastHashJoin on the fact side.
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = executedPlan("j1_join_topk")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled fact join, got:\n$plan")
    }
  }

  test("CTE warehouse: targname filter prunes hive partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val pipe = new cte.CtePipeline(spark, s"$root/wh")
    pipe.ingestFileinfo(cte.CteFixtures.fileinfo(spark))
    val other = cte.CteFixtures.fileinfo(spark)
      .withColumn("targname", lit("ngc6791"))
      .withColumn("imagename", concat(col("imagename"), lit("_b")))
    pipe.ingestFileinfo(other)
    val plan = pipe.table("fileinfo")
      .filter(col("targname") === cte.CteFixtures.T)
      .queryExecution.executedPlan.toString
    // the scan must carry a partition filter, and only read matching rows
    assert(plan.contains("PartitionFilters: [isnotnull(targname"), plan)
    val n = pipe.table("fileinfo")
      .filter(col("targname") === cte.CteFixtures.T).count()
    assert(n == cte.CteFixtures.fileinfo(spark).count())
  }

  test("CTE warehouse: dim-side filter prunes fact partitions dynamically (DPP)") {
    // The 100 TB version of the static-pruning test above: the selective
    // predicate lives on a DIMENSION table, the fact's partition values
    // are only known at runtime from the join — dynamic partition
    // pruning must plant a runtime subquery in the fact scan's
    // PartitionFilters, or the join reads every partition of a
    // 100 TB fact to discard most of it post-join.
    val root = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val pipe = new cte.CtePipeline(spark, s"$root/wh")
    pipe.ingestFileinfo(cte.CteFixtures.fileinfo(spark))
    val other = cte.CteFixtures.fileinfo(spark)
      .withColumn("targname", lit("ngc6791"))
      .withColumn("imagename", concat(col("imagename"), lit("_b")))
    pipe.ingestFileinfo(other)
    import spark.implicits._
    // the dim must be a FILE source: a LocalRelation's filter constant-
    // folds away (ConvertToLocalRelation) and DPP then sees no selective
    // predicate on the pruning side
    Seq((cte.CteFixtures.T, "programA"), ("ngc104", "programB"))
      .toDF("targname", "program")
      .write.mode("overwrite").parquet(s"$root/dim")
    val dim = spark.read.parquet(s"$root/dim")
    val joined = pipe.table("fileinfo")
      .join(dim.filter(col("program") === "programA"), "targname")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan lost its DPP subquery:\n${plan.take(3000)}")
    assert(joined.count() == cte.CteFixtures.fileinfo(spark).count())
  }

  test("scan-only pipeline ops carry no exchange: d8 sample, t6 chunking, v7 quantize") {
    // These three are the "runs at NVMe speed on 100 TB" class — a
    // shuffle appearing in any of them is a plan regression. (The final
    // orderBy is dropped here: Verify adds it only for deterministic
    // hashing; pipeline use is unordered.)
    for (name <- Seq("d8_stratified_sample", "t6_chunking", "v7_quantize",
        "t11_pii_redact", "t12_ngram_score")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val noSort = df.queryExecution.optimizedPlan match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.child
        case p => p
      }
      val plan = org.apache.spark.sql.graftshim.ColumnBridge
        .ofRows(spark, noSort).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name grew a shuffle:\n$plan")
    }
  }

  test("v9 vector stats is scan-only; k1/t8 run their selection on GroupedTopK") {
    val df = SparkEntry.queries("v9_vector_stats")(spark, sfDir)
    val noSort = df.queryExecution.optimizedPlan match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.child
      case p => p
    }
    val plan = org.apache.spark.sql.graftshim.ColumnBridge
      .ofRows(spark, noSort).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"v9 grew a shuffle:\n$plan")
    for (name <- Seq("k1_kmv_distinct", "t8_topk_ngrams")) {
      val p = executedPlan(name)
      assert(p.contains("GroupedTopK"), s"$name lost its GroupedTopK:\n$p")
    }
  }

  test("w8 percentiles: rank selection over distinct values, never a fact sort") {
    // r12 rewrite (the a2-class low-cardinality window hazard): rank
    // selection = cumulative-count selection over DISTINCT values. Pin:
    val p = executedPlan("w8_percentiles")
    // 1. the fact scan is map-side combined down to distinct
    //    (event_type, v) rows before anything crosses an exchange
    assert(p.contains("partial_count"), s"w8 lost map-side combine:\n$p")
    // 2. no row_number sort of fact rows — the cumulative windows run
    //    over the aggregated table only
    assert(!p.contains("row_number"), s"w8 regressed to a fact-row rank:\n$p")
    // 3. two hash exchanges total: the distinct-value aggregate + the
    //    within-group cumulative pass (the final ORDER BY is range)
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nExchanges <= 2, s"w8 grew an exchange:\n$p")
    // 4. no cached fragment spliced in from another query's leaked
    //    persist (the r12 dq2 leak substituted an InMemoryTableScan here)
    assert(!p.contains("InMemoryTableScan"),
      s"w8 plan contaminated by a leaked cache entry:\n$p")
  }

  test("round-5 scale shapes: t9 one exchange, k2 partial agg, x3 broadcast probe") {
    // t9 packing: the running total must cost ONE hash exchange (the
    // per-shard window); a second would mean the spine re-shuffles.
    val t9 = SparkEntry.queries("t9_seq_pack")(spark, sfDir)
    val t9NoSort = t9.queryExecution.optimizedPlan match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.child
      case p => p
    }
    val t9Plan = org.apache.spark.sql.graftshim.ColumnBridge
      .ofRows(spark, t9NoSort).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(t9Plan).length == 1,
      s"t9 grew a second shuffle:\n$t9Plan")

    // k2 CMS: the counter shuffle must be map-side combined — the cells
    // partial-aggregate before the exchange.
    val k2Plan = executedPlan("k2_cms_heavy")
    assert(k2Plan.contains("partial_count"), s"k2 lost map-side combine:\n$k2Plan")

    // x3 bloom: both word lookups broadcast (never a shuffled join on
    // the probe), and the probe scan reads ONLY the join key.
    val x3Plan = executedPlan("x3_bloom_prune")
    assert("BroadcastHashJoin".r.findAllIn(x3Plan).length >= 2,
      s"x3 word lookup stopped broadcasting:\n$x3Plan")
    val probeScan = x3Plan.linesIterator
      .filter(_.contains("lineitem.parquet")).mkString
    assert(probeScan.contains("struct<l_orderkey:bigint>"),
      s"x3 probe scan reads more than the key:\n$probeScan")
  }

  test("v13/v14 serving shape: probe is corpus-scan-free, rerank touches the corpus once, pruned") {
    import graft.operators.IvfPqIndex
    val idx = IvfPqIndex.ensure(spark, sfDir)
    // literal query vectors isolate the INDEX side of the plan: any
    // embeddings.parquet scan that appears can only come from the probe
    // path itself, which is exactly what must never happen
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
      .select("vec_id", "embedding")
    val litQ = spark.createDataFrame(
      spark.sparkContext.parallelize(q.collect().toSeq), q.schema)

    val probePlan = IvfPqIndex.probe(spark, idx, litQ)
      .queryExecution.executedPlan.toString
    // the defining serving property: ADC ranks candidates from the CODES
    // table — the corpus embeddings are never read
    assert(!probePlan.contains("embeddings.parquet"),
      s"probe path scans the corpus:\n${probePlan.take(3000)}")
    assert(probePlan.contains("pq_codes"),
      s"probe lost its codes-table read:\n${probePlan.take(3000)}")
    // query subvectors + codebooks ride broadcast joins; a deoptimized
    // probe (e.g. dropping the hints into shuffles) loses these nodes
    assert("BroadcastHashJoin".r.findAllIn(probePlan).length >= 2,
      s"probe quantizer lookups stopped broadcasting:\n${probePlan.take(3000)}")

    // the composed pipeline: exactly ONE corpus scan (the rerank's
    // neighbor side — point lookups bounded by candK·|queries|), and that
    // scan reads only the id + vector columns
    val corpus = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val refinedPlan = IvfPqIndex.probeRefined(spark, idx, litQ, corpus)
      .queryExecution.executedPlan.toString
    val corpusScans = refinedPlan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("embeddings.parquet"))
      .toList
    assert(corpusScans.length == 1,
      s"rerank should scan the corpus exactly once, saw ${corpusScans.length}:\n" +
        corpusScans.mkString("\n"))
    assert(corpusScans.head.contains("struct<vec_id:bigint,embedding:array<float>>"),
      s"rerank corpus scan is not pruned to (vec_id, embedding):\n${corpusScans.head}")
  }

  test("x4 bucketed join: both fact sides pre-partitioned, no join-input exchange") {
    // Broadcast off so the join can't dodge the requirement check; the
    // bucketed layout must then satisfy both sides' hash-partitioning
    // requirement and EnsureRequirements must insert NO exchange under
    // the join. The only shuffle in the whole plan is the final tiny
    // aggregate on o_orderpriority.
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = executedPlan("x4_bucketed_join")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast equi-join:\n$plan")
      // every exchange in the plan belongs to the post-join rollup (agg
      // hash-partitioning + orderBy range-partitioning on the tiny
      // 5-group key) — an exchange mentioning an ORDER KEY means the
      // bucket layout stopped satisfying the join's distribution.
      val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toList
      assert(exchanges.nonEmpty && exchanges.forall(e =>
          e.contains("o_orderpriority") && !e.contains("orderkey")),
        s"bucketed join must shuffle only the final rollup, saw:\n" +
          exchanges.mkString("\n"))
    }
  }

  test("x5 summary rewrite: the aggregate reads the summary table, not the fact") {
    // The query is written against the base lineitem scan; with the MV
    // registered, the optimizer must serve it from the grain table —
    // the fact file may not appear anywhere in the executed plan.
    val plan = executedPlan("x5_mv_rewrite")
    assert(plan.contains("graft_mv2_lineitem"),
      s"summary table missing from plan:\n${plan.take(3000)}")
    assert(!plan.contains("lineitem.parquet"),
      s"rewritten aggregate still scans the fact:\n${plan.take(3000)}")
    // kill switch: same query with the rule disabled scans the fact —
    // and both plans return identical rows (the soundness half).
    withConf("spark.graft.mv.rewrite" -> "false") {
      val off = executedPlan("x5_mv_rewrite")
      assert(off.contains("lineitem.parquet"),
        s"kill switch did not restore the base scan:\n${off.take(3000)}")
      val a = SparkEntry.queries("x5_mv_rewrite")(spark, sfDir).collect()
      withConf("spark.graft.mv.rewrite" -> "true") {
        val b = SparkEntry.queries("x5_mv_rewrite")(spark, sfDir).collect()
        assert(a.toSeq == b.toSeq, "rewritten result differs from base")
      }
    }
  }

  test("late round-8 shapes: w13 single window exchange, st5 keyed fold, " +
       "dq3 no product joins") {
    // w13: both frame aggregates (count + cents sum) must share one
    // window over one hash exchange on user_id — a second Exchange or a
    // self-join formulation would double the shuffle at 100 TB.
    val w13 = executedPlan("w13_range_frame")
    val w13Exchanges = "Exchange hashpartitioning".r
      .findAllIn(w13).size
    assert(w13Exchanges == 1, s"w13 expected 1 hash exchange:\n${w13.take(2500)}")
    assert("\\bWindow\\b".r.findAllIn(w13).size == 1,
      s"w13 expected a single Window operator:\n${w13.take(2500)}")
    // st5: the batch-mode keyed-state operator is MapGroups over ONE
    // hash exchange on the grouping key — state scales with keys.
    val st5 = executedPlan("st5_user_profile")
    assert(st5.contains("MapGroups"), s"st5 lost MapGroups:\n${st5.take(2500)}")
    assert("Exchange hashpartitioning".r.findAllIn(st5).size == 1,
      s"st5 expected 1 hash exchange:\n${st5.take(2500)}")
    // dq3: dimension-sized daily table + windows — never a product join.
    val dq3 = executedPlan("dq3_volume_anomaly")
    assert(!dq3.contains("CartesianProduct") &&
           !dq3.contains("BroadcastNestedLoopJoin"),
      s"dq3 planned a product join:\n${dq3.take(2500)}")
  }

  test("round-8 scale shapes: t15 top-3 on GroupedTopK, gr2 all equi-joins") {
    // t15's per-doc top-3 is written as the row_number()<=k idiom; the
    // RowNumberTopKRewrite rule must plan it onto the bounded-heap
    // GroupedTopK operator, never a WindowExec sort of the full scored
    // term table.
    val t15 = executedPlan("t15_tfidf_topterms")
    assert(t15.contains("GroupedTopK"),
      s"t15 lost the GroupedTopK rewrite:\n${t15.take(3000)}")
    // gr2's wedge and closing-edge joins both key on columns — the
    // orientation construction must never degrade to a cartesian or
    // nested-loop product over the pair graph.
    val gr2 = executedPlan("gr2_triangles")
    assert(!gr2.contains("CartesianProduct") &&
           !gr2.contains("BroadcastNestedLoopJoin"),
      s"gr2 planned a product join:\n${gr2.take(3000)}")
  }

  private def withConf(kv: (String, String))(body: => Unit): Unit = {
    val (k, v) = kv
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None    => spark.conf.unset(k)
    }
  }
}
