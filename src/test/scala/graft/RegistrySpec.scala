package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants, enforced at test time so a future query-pack
  * addition cannot silently ship outside the correctness gate: every
  * registered query MUST carry a DuckDB oracle (the driver's per-round
  * compare covers exactly the intersection — an oracle-less query would
  * look green forever without ever being checked), and every oracle must
  * point at a real query. CountQueries prints the same facts for manual
  * bookkeeping; this spec is the failing-build version. */
class RegistrySpec extends AnyFunSuite {

  test("every registered query has an oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries with NO oracle (unchecked forever): ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"oracles without a query (dead weight): ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across packs (no silent Map collisions)") {
    // SparkEntry.queries is a Map built by concatenating pack maps — a
    // duplicated name would silently drop one implementation. Guard by
    // summing the pack sizes and comparing with the merged size.
    val packs = SparkEntry.packs
    val total = packs.map(_.queries.size).sum
    assert(total == SparkEntry.queries.size,
      "two query packs register the same query name")
    val oracleTotal = packs.map(_.oracles.size).sum
    assert(oracleTotal == SparkEntry.oracleSql.size,
      "two query packs register the same oracle name")
  }
}
