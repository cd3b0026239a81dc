package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-hardening behavior (VERDICT r7 task 5) without running a
  * bench: the spread guard that refuses to commit a bimodal median
  * silently, and the record renderer used for both the incremental
  * (partial) and final file writes. */
class BenchSpec extends AnyFunSuite {

  test("spread guard flags unrepresentative medians, passes honest ones") {
    // r7's actual thrash sample — median sits in the slow mode, caught
    assert(Bench.spreadSuspect(Seq(6.0, 62.0, 52.7)))
    assert(Bench.spreadSuspect(Seq(114.2, 49.5, 10.4)))
    // steady samples and singletons must not be
    assert(!Bench.spreadSuspect(Seq(0.8, 0.9, 1.0)))
    assert(!Bench.spreadSuspect(Seq(2.0)))
    assert(!Bench.spreadSuspect(Nil))
    // sub-2s-median regime: the loose 3x boundary (JIT/page-cache jitter
    // on cheap queries is real; a 2x rule would re-run them forever)
    assert(!Bench.spreadSuspect(Seq(0.5, 1.5, 1.5)))
    assert(Bench.spreadSuspect(Seq(0.5, 1.51, 1.51)))
    // >2s-median regime: the TIGHT 2x boundary (r9's c1 committed an
    // 11.8 s median at median/min 2.76x — GC-mode bimodality, not noise)
    assert(Bench.spreadSuspect(Seq(4.29, 11.82, 12.81)))
    assert(Bench.spreadSuspect(Seq(5.0, 10.1)))
    assert(!Bench.spreadSuspect(Seq(5.0, 9.9)))
    // a single slow OUTLIER above a tight cluster leaves the median
    // honest — must NOT flag (r10's actual d6 sample, one 912 ms GC hit)
    assert(!Bench.spreadSuspect(Seq(1.83, 2.01, 3.93, 1.99, 1.92, 2.02)))
  }

  test("mkRec computes median over all runs and carries the flag") {
    val steady = Bench.mkRec(List(1.0, 1.1, 1.2), List(0L, 0L, 0L), 1.3)
    assert(steady.median == 1.1 && !steady.spreadFlagged)
    val bimodal =
      Bench.mkRec(List(6.0, 62.0, 52.7, 5.8, 61.0, 60.0), List.fill(6)(0L), 7.0)
    assert(bimodal.median == 60.0 && bimodal.spreadFlagged)
    assert(bimodal.times.size == 6) // re-run sample retained whole
  }

  test("mkRecRerun commits the tighter batch's median, keeps all times") {
    // r10's actual a3 sample: a cold-start-skewed first batch, then a
    // clean re-run. The old append path committed median 3.35 (inside
    // the cold batch) and the post-append ratio self-cleared the flag.
    val first = List(11.0, 11.7, 3.35)
    val rerun = List(2.71, 2.40, 1.83)
    val rec = Bench.mkRecRerun(first, List.fill(3)(0L),
      rerun, List.fill(3)(0L), 12.0)
    assert(rec.median == 2.40, s"median must come from the clean batch, got ${rec.median}")
    assert(rec.times.size == 6 && rec.min == 1.83 && rec.max == 11.7,
      "all six runs stay in the record")
    assert(!rec.spreadFlagged, "a tight re-run batch legitimately clears the flag")
    // spread persists across BOTH batches → stays flagged, first batch
    // picked when its spread is tighter
    val stillBad = Bench.mkRecRerun(List(4.0, 10.0, 10.5), List.fill(3)(0L),
      List(3.0, 11.0, 12.0), List.fill(3)(0L), 10.0)
    assert(stillBad.spreadFlagged, "persistent bimodality must stay flagged")
    assert(stillBad.median == 10.0, "tighter (first) batch supplies the median")
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
