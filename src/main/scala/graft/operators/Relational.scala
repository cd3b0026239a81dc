package graft.operators

import graft.{Exact, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator inventory (SURVEY.md §2.1–§2.8) expressed on
  * the driver corpus.
  *
  * Operator IDs in query names refer to SURVEY.md §2 rows, e.g. `j2` is the
  * chip-pair self-join of the reference
  * (/root/reference/wfc3_cte_monitor/database_queries.py:589-678) re-cast as
  * an equi self-join on match keys.
  *
  * Scale notes are per-query; the common themes:
  *   - filters/projections stay in the parquet scan (pushdown + pruning);
  *   - dimension-sized sides of joins are broadcast;
  *   - aggregations are partial (map-side combine) by construction.
  */
object Relational extends QueryPack {

  // -- s1/p1/p3/p4/p5: scan + projection + conjunctive/range/string filters.
  //    All predicates reach the parquet reader as PushedFilters; only the 5
  //    projected columns are read (ReadSchema). Raw columns pass through
  //    untouched → bit-exact vs the oracle.
  private val s1ScanFilterProject: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate").between(lit("1996-01-01").cast("timestamp"),
                                  lit("1997-12-31").cast("timestamp")) &&
        col("l_quantity").between(10, 20) &&
        col("l_returnflag") === "R" &&
        col("l_linestatus").contains("F"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
              "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val s1Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      |  AND l_quantity BETWEEN 10 AND 20
      |  AND l_returnflag = 'R'
      |  AND l_linestatus LIKE '%F%'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // -- a1-basic: the TPC-H Q1 shape — grouped aggregation with map-side
  //    combine; 4 groups regardless of input size, so the shuffle is tiny.
  //    DECIMAL arithmetic end-to-end (see Exact) for oracle parity.
  private val q1PricingAgg: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        Exact.dec2(col("l_quantity")).as("qty"),
        Exact.dec2(col("l_extendedprice")).as("price"),
        (lit(1) - Exact.dec2(col("l_discount"))).cast("decimal(4,2)").as("dfac"),
        (lit(1) + Exact.dec2(col("l_tax"))).cast("decimal(4,2)").as("tfac"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty")).cast("double").as("sum_qty"),
        sum(col("price")).cast("double").as("sum_base_price"),
        sum((col("price") * col("dfac")).cast("decimal(24,4)"))
          .cast("double").as("sum_disc_price"),
        sum(((col("price") * col("dfac")).cast("decimal(24,4)") * col("tfac"))
          .cast("decimal(30,6)")).cast("double").as("sum_charge"),
        (sum(col("qty")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("price")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1Sql =
    """WITH t AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |         CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS dfac,
      |         CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS tfac
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-12-01')
      |SELECT l_returnflag, l_linestatus,
      |       CAST(sum(qty) AS DOUBLE) AS sum_qty,
      |       CAST(sum(price) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(price * dfac AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
      |       CAST(sum(CAST(CAST(price * dfac AS DECIMAL(24,4)) * tfac AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      |       CAST(sum(qty) AS DOUBLE) / count(*) AS avg_qty,
      |       CAST(sum(price) AS DOUBLE) / count(*) AS avg_price,
      |       count(*) AS count_order
      |FROM t
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -- j1/o-topk: 3-way join, dimension side broadcast, grouped revenue,
  //    deterministic top-10 (revenue desc, key asc tiebreak). The TPC-H Q3
  //    shape: at 100 TB customer/orders filter first, lineitem shuffles once.
  private val j1JoinTopk: Q = (s, dir) => {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("2000-06-30").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      .select(col("l_orderkey"),
        (Exact.dec2(col("l_extendedprice")) *
          (lit(1) - Exact.dec2(col("l_discount"))).cast("decimal(4,2)"))
          .cast("decimal(24,4)").as("rev"))
    // orders is fact-sized (the date filter keeps nearly all rows), so it
    // must NOT be broadcast — lineitem⋈orders shuffles on the join key and
    // AQE picks the strategy. Only the filtered customer dimension (one
    // segment ≈ 1/5 of a dim table) is a safe explicit broadcast.
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  private val j1Sql =
    """SELECT o_orderkey, o_orderdate,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
      |             AS DECIMAL(24,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '2000-06-30'
      |  AND l_shipdate  > TIMESTAMP '1996-03-15'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // -- j2: the reference's chip-pair self-join (chip=1 side matched to
  //    chip=2 side on equal keys) — here linenumber 1 vs 2 within an order.
  //    Self-join on the (already hash-partitionable) key; AQE picks the
  //    strategy; at scale both sides shuffle on l_orderkey exactly once.
  private val j2PairSelfJoin: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val a = li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_partkey").as("part_1"),
              col("l_quantity").as("qty_1"))
    val b = li.filter(col("l_linenumber") === 2)
      .select(col("l_orderkey"), col("l_partkey").as("part_2"),
              col("l_quantity").as("qty_2"))
    a.join(b, "l_orderkey")
      .withColumn("qty_diff", col("qty_1") - col("qty_2"))
      .orderBy("l_orderkey")
  }

  private val j2Sql =
    """SELECT a.l_orderkey, a.l_partkey AS part_1, a.l_quantity AS qty_1,
      |       b.l_partkey AS part_2, b.l_quantity AS qty_2,
      |       a.l_quantity - b.l_quantity AS qty_diff
      |FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |WHERE a.l_linenumber = 1 AND b.l_linenumber = 2
      |ORDER BY a.l_orderkey""".stripMargin

  // -- j4/w1: positional (rank) pairing — the reference's 180-degree
  //    alphabetical-order matching (database_queries.py:683-740): rank each
  //    side within its group by a deterministic order, equi-join on rank.
  private val j4RankPairJoin: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select("user_id", "event_id", "ts", "event_type")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    def side(t: String, outCol: String) =
      ev.filter(col("event_type") === t)
        .withColumn("rn", row_number().over(w))
        .select(col("user_id"), col("event_id").as(outCol), col("rn"))
    side("click", "click_id")
      .join(side("view", "view_id"), Seq("user_id", "rn"))
      .select("user_id", "rn", "click_id", "view_id")
      .orderBy("user_id", "rn")
  }

  private val j4Sql =
    """WITH a AS (
      |  SELECT user_id, event_id AS click_id,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'click'),
      |b AS (
      |  SELECT user_id, event_id AS view_id,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'view')
      |SELECT a.user_id, a.rn, a.click_id, b.view_id
      |FROM a JOIN b ON a.user_id = b.user_id AND a.rn = b.rn
      |ORDER BY a.user_id, a.rn""".stripMargin

  // -- j1-semi / j7-anti: the reference's semi-join loops and dead-code
  //    anti-join (database_update.py:514-519) as real (anti) joins.
  private val j1SemiJoin: Q = (s, dir) => {
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 49)
      .select("l_orderkey")
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  private val j1SemiSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin

  private val j7AntiJoin: Q = (s, dir) => {
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
  }

  private val j7Sql =
    """SELECT c_custkey, c_name, c_nationkey
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -- a5/w2: gap-based sessionization — the reference's epoch merge
  //    (uvis_external_cte_plots.py:2173-2212) generalized: lag → gap flag →
  //    running sum = session id → per-session aggregates. One shuffle on
  //    user_id; the two window functions share the same partitioning.
  private val a5Sessionize: Q = (s, dir) => {
    val gapMs = 30L * 60 * 1000
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select("user_id", "event_id", "ts")
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ms").isNull ||
             unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // Session bounds are emitted as BIGINT epoch-millis, not timestamps:
      // an integer millis value hashes identically across engines
      // regardless of how each represents the timestamp (the corpus has
      // shipped ts as both TIMESTAMP(NANOS)-as-long and native
      // TIMESTAMP(MICROS) across generations — see Tables.events).
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min(unix_millis(col("ts"))).as("session_start_ms"),
           max(unix_millis(col("ts"))).as("session_end_ms"))
      .orderBy("user_id", "session_id")
  }

  private val a5Sql =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |         epoch_ms(lag(ts) OVER w) AS prev_ms,
      |         epoch_ms(ts) AS ts_ms
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (
      |  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
      |                 THEN 1 ELSE 0 END AS new_s
      |  FROM g),
      |sess AS (
      |  -- CAST: DuckDB widens sum(int) to HUGEINT (int128); Spark emits
      |  -- int64. The driver hashes the typed value, so the declared types
      |  -- must match, not just the numeric values.
      |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
      |                                  ORDER BY ts, event_id
      |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |            AS session_id
      |  FROM f)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // -- a10: pivot (long→wide), the reference's mag-file state machine
  //    (database_update.py:364-478) as one shuffle + conditional agg.
  //    Pivot values are declared, so Spark needs no extra pass to infer them.
  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  private val a10Pivot: Q = (s, dir) => {
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), Exact.dec2(col("value")).as("v"))
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(sum(col("v")).cast("double"))
      .orderBy("user_id")
  }

  private val a10Sql =
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type='click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
      |  CAST(sum(CASE WHEN event_type='view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view,
      |  CAST(sum(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
      |  CAST(sum(CASE WHEN event_type='signup'   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
      |  CAST(sum(CASE WHEN event_type='error'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // -- se1/se2/se3: set operations (SURVEY §2.7).
  private val se1Intersect: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val a = li.filter(col("l_returnflag") === "A").select("l_partkey")
    val r = li.filter(col("l_returnflag") === "R").select("l_partkey")
    a.intersect(r).orderBy("l_partkey")
  }

  private val se1Sql =
    """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      |INTERSECT
      |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY l_partkey""".stripMargin

  private val se2Except: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val a = li.filter(col("l_returnflag") === "A").select("l_partkey")
    val r = li.filter(col("l_returnflag") === "R").select("l_partkey")
    a.except(r).orderBy("l_partkey")
  }

  private val se2Sql =
    """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      |EXCEPT
      |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY l_partkey""".stripMargin

  private val se3Union: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val hi = o.filter(col("o_totalprice") > 400000).select("o_orderkey")
    val ur = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    hi.union(ur).distinct().orderBy("o_orderkey")
  }

  private val se3Sql =
    """SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
      |UNION
      |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey""".stripMargin

  // -- a8/o2: distinct + sort (the reference's sorted(set(…)) idiom).
  private val a8Distinct: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(trunc(col("o_orderdate"), "month").as("order_month"))
      .distinct()
      .orderBy("order_month")
  }

  private val a8Sql =
    """SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month
      |FROM orders ORDER BY order_month""".stripMargin

  // -- a15: ROLLUP subtotals — the OLAP reporting staple (per-(flag,
  //    status) revenue with per-flag and grand totals in one pass).
  //    Spark plans rollup as Expand (one extra row set per grouping
  //    level) + a single hash aggregation — still one shuffle; no
  //    re-aggregation of the base table per level. Sums stay exact
  //    decimal and cross into the hashed output via string→double; null
  //    ordering is pinned explicitly on both engines (their defaults
  //    differ).
  private val a15Rollup: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        graft.Exact.dec2(col("l_extendedprice")).as("p"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast("string").cast("double").as("revenue"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  private val a15Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // -- g1: CUBE — all 4 grouping sets over (status, priority) from ONE
  //    Expand + hash aggregate (same single-shuffle shape as a15's
  //    ROLLUP; Expand multiplies rows 4× BEFORE the exchange but the
  //    partial aggregate collapses them map-side, so the shuffle still
  //    carries only |groups| rows per level). grouping_id() disambiguates
  //    subtotal NULLs from data NULLs — emitted so the oracle compare is
  //    level-aware, not name-collision-prone.
  private val g1Cube: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        graft.Exact.dec2(col("o_totalprice")).as("p"))
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().as("g"),
        count(lit(1)).as("n"),
        sum(col("p")).cast("string").cast("double").as("total_price"))
      .orderBy(col("g"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  private val g1Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS g,
      |       count(*) AS n,
      |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // -- g2: explicit GROUPING SETS — the combination ROLLUP/CUBE can't
  //    express: the two single-column marginals plus the grand total,
  //    but NOT the (flag, status) cross — a dashboard that wants both
  //    axes' subtotals without paying for the full cross-product level.
  //    Same single Expand + one-shuffle plan as a15/g1: Expand emits 3
  //    rows per input (one per set), and the map-side partial aggregate
  //    collapses them before the exchange, so the shuffle carries
  //    |flags| + |statuses| + 1 rows, not 3×|lineitem|.
  private val g2GroupingSets: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        graft.Exact.dec2(col("l_extendedprice")).as("p"))
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("g"),
        count(lit(1)).as("n"),
        sum(col("p")).cast("string").cast("double").as("revenue"))
      .orderBy(col("g"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  private val g2Sql =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS g,
      |       count(*) AS n,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // -- g3: native UNPIVOT (melt) — wide → long without the union-of-
  //    selects workaround: one narrow Expand per row (3 outputs), no
  //    shuffle until the output sort. The inverse face of a10's pivot;
  //    both directions are now first-class. Values share one DOUBLE
  //    type as unpivot requires; ids stay columns.
  private val g3Unpivot: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_custkey").cast("double").as("o_custkey_d"),
        year(col("o_orderdate")).cast("double").as("o_year"))
      .unpivot(
        Array(col("o_orderkey")),
        Array(col("o_totalprice"), col("o_custkey_d"), col("o_year")),
        "measure", "value")
      .orderBy("o_orderkey", "measure")
  }

  private val g3Sql =
    """SELECT o_orderkey, measure, value FROM (
      |  SELECT o_orderkey, o_totalprice,
      |         CAST(o_custkey AS DOUBLE) AS o_custkey_d,
      |         CAST(year(o_orderdate) AS DOUBLE) AS o_year
      |  FROM orders)
      |UNPIVOT (value FOR measure IN (o_totalprice, o_custkey_d, o_year))
      |ORDER BY o_orderkey, measure""".stripMargin

  // -- j9: FULL OUTER join — the reconciliation shape (which nations have
  //    BUILDING-segment customers but no high-balance suppliers, and vice
  //    versa). Both sides pre-aggregate to |nations| rows BEFORE the
  //    join, so the full-outer itself is dimension×dimension (cheap at
  //    any scale); joining the raw fact tables full-outer would be the
  //    mistake. NULL sides are kept (that's the point of the operator)
  //    and a presence flag pins the match classes.
  // -- dq1: data-quality constraint report — the Deequ/great-expectations
  //    shape every production pipeline runs before publishing a table:
  //    uniqueness, completeness, and referential-integrity metrics as
  //    data. Each table's metrics come from ONE partial-aggregated scan
  //    (count + conditional sums + countDistinct together); the FK
  //    orphan check is an anti-join that AQE sizes. Long (check, metric)
  //    output so new checks append rows, not columns.
  private val dq1Report: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val om = o.agg(
      count(lit(1)).as("orders_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
        .as("orders_null_custkey"),
      (count(lit(1)) - countDistinct(col("o_orderkey")))
        .as("orders_dup_orderkey"))
    val lm = l.agg(
      count(lit(1)).as("lineitem_rows"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L))
        .as("lineitem_null_qty"))
    val orphans = l.join(o.select("o_orderkey"),
        l("l_orderkey") === o("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("lineitem_orphans"))
    om.crossJoin(lm).crossJoin(orphans)
      .selectExpr("""stack(6,
        'orders_rows', orders_rows,
        'orders_null_custkey', orders_null_custkey,
        'orders_dup_orderkey', orders_dup_orderkey,
        'lineitem_rows', lineitem_rows,
        'lineitem_null_qty', lineitem_null_qty,
        'lineitem_orphans', lineitem_orphans) AS (check_name, metric)""")
      .orderBy("check_name")
  }

  private val dq1Sql =
    """SELECT 'orders_rows' AS check_name,
      |       (SELECT count(*) FROM orders) AS metric
      |UNION ALL
      |SELECT 'orders_null_custkey',
      |       (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
      |UNION ALL
      |SELECT 'orders_dup_orderkey',
      |       (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
      |UNION ALL
      |SELECT 'lineitem_rows', (SELECT count(*) FROM lineitem)
      |UNION ALL
      |SELECT 'lineitem_null_qty',
      |       (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL)
      |UNION ALL
      |SELECT 'lineitem_orphans',
      |       (SELECT count(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                          WHERE o.o_orderkey = l.l_orderkey))
      |ORDER BY check_name""".stripMargin

  private val j9FullOuter: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, dir)
      .filter(col("s_acctbal") > 5000.0)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("n_cust"), col("n_supp"),
        when(col("c_nationkey").isNull, "supp_only")
          .when(col("s_nationkey").isNull, "cust_only")
          .otherwise("both").as("presence"))
      .orderBy("nationkey")
  }

  private val j9Sql =
    """WITH c AS (
      |  SELECT c_nationkey, count(*) AS n_cust FROM customer
      |  WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey),
      |s AS (
      |  SELECT s_nationkey, count(*) AS n_supp FROM supplier
      |  WHERE s_acctbal > 5000.0 GROUP BY s_nationkey)
      |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
      |       n_cust, n_supp,
      |       CASE WHEN c_nationkey IS NULL THEN 'supp_only'
      |            WHEN s_nationkey IS NULL THEN 'cust_only'
      |            ELSE 'both' END AS presence
      |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  def queries: Map[String, Q] = Map(
    "s1_scan_filter_project" -> s1ScanFilterProject,
    "q1_pricing_agg"         -> q1PricingAgg,
    "a15_rollup"             -> a15Rollup,
    "g1_cube"                -> g1Cube,
    "g2_grouping_sets"       -> g2GroupingSets,
    "g3_unpivot"             -> g3Unpivot,
    "dq1_constraint_report"  -> dq1Report,
    "j9_full_outer"          -> j9FullOuter,
    "j1_join_topk"           -> j1JoinTopk,
    "j1_semi_join"           -> j1SemiJoin,
    "j2_pair_selfjoin"       -> j2PairSelfJoin,
    "j4_rank_pair_join"      -> j4RankPairJoin,
    "j7_anti_join"           -> j7AntiJoin,
    "a5_sessionize"          -> a5Sessionize,
    "a8_distinct_sort"       -> a8Distinct,
    "a10_pivot_events"       -> a10Pivot,
    "se1_intersect"          -> se1Intersect,
    "se2_except"             -> se2Except,
    "se3_union"              -> se3Union)

  def oracles: Map[String, String] = Map(
    "s1_scan_filter_project" -> s1Sql,
    "q1_pricing_agg"         -> q1Sql,
    "a15_rollup"             -> a15Sql,
    "g1_cube"                -> g1Sql,
    "g2_grouping_sets"       -> g2Sql,
    "g3_unpivot"             -> g3Sql,
    "dq1_constraint_report"  -> dq1Sql,
    "j9_full_outer"          -> j9Sql,
    "j1_join_topk"           -> j1Sql,
    "j1_semi_join"           -> j1SemiSql,
    "j2_pair_selfjoin"       -> j2Sql,
    "j4_rank_pair_join"      -> j4Sql,
    "j7_anti_join"           -> j7Sql,
    "a5_sessionize"          -> a5Sql,
    "a8_distinct_sort"       -> a8Sql,
    "a10_pivot_events"       -> a10Sql,
    "se1_intersect"          -> se1Sql,
    "se2_except"             -> se2Sql,
    "se3_union"              -> se3Sql)
}
