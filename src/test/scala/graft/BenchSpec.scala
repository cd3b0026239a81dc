package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-hardening behavior (VERDICT r7 task 5) without running a
  * bench: the spread guard that refuses to commit a bimodal median
  * silently, and the record renderer used for both the incremental
  * (partial) and final file writes. */
class BenchSpec extends AnyFunSuite {

  test("spread guard flags bimodal samples, passes steady ones") {
    // r7's actual thrash sample — must be caught
    assert(Bench.spreadSuspect(Seq(6.0, 62.0, 52.7)))
    assert(Bench.spreadSuspect(Seq(114.2, 49.5, 10.4)))
    // steady samples and singletons must not be
    assert(!Bench.spreadSuspect(Seq(0.8, 0.9, 1.0)))
    assert(!Bench.spreadSuspect(Seq(2.0)))
    assert(!Bench.spreadSuspect(Nil))
    // boundary: exactly 3.0x is allowed, just above is not
    assert(!Bench.spreadSuspect(Seq(1.0, 3.0)))
    assert(Bench.spreadSuspect(Seq(1.0, 3.01)))
  }

  test("mkRec computes median over all runs and carries the flag") {
    val steady = Bench.mkRec(List(1.0, 1.1, 1.2), List(0L, 0L, 0L), 1.3)
    assert(steady.median == 1.1 && !steady.spreadFlagged)
    val bimodal =
      Bench.mkRec(List(6.0, 62.0, 52.7, 5.8, 6.1, 6.3), List.fill(6)(0L), 7.0)
    assert(bimodal.spreadFlagged)
    assert(bimodal.times.size == 6) // re-run sample retained whole
  }

  test("renderJson emits valid JSON with flags, failures and partial mark") {
    val stats = Seq(
      "q_ok" -> Bench.mkRec(List(0.2), List(0L), 0.3),
      "q_thrash" -> Bench.mkRec(List(1.0, 9.9, 9.8), List(0L, 0L, 0L), 1.2))
    val json = Bench.renderJson(stats, Seq("q_dead"), "/sf", partial = true)
    // structure: parseable by the driver's json.load
    val parsed = ujsonLite(json)
    assert(parsed.contains("\"metric\":\"total\""))
    assert(parsed.contains("\"failed\":[\"q_dead\"]"))
    assert(parsed.contains("\"spread_flagged\":[\"q_thrash\"]"))
    assert(parsed.contains("\"partial\":true"))
    val fin = Bench.renderJson(stats, Nil, "/sf", partial = false)
    assert(!fin.contains("\"partial\""))
    assert(fin.contains("\"spread_flagged\":true")) // per-query stat flag
  }

  /** Minimal structural check that the string is one JSON object (balanced
    * braces/brackets outside strings); returns the input for contains(). */
  private def ujsonLite(s: String): String = {
    var depth = 0; var inStr = false; var esc = false
    s.foreach { c =>
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1; assert(depth >= 0, "unbalanced")
        case _ =>
      }
    }
    assert(depth == 0 && !inStr, "unterminated JSON")
    assert(s.head == '{' && s.last == '}')
    s
  }
}
