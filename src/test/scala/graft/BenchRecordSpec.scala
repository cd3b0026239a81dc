package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CI-shape guard over the COMMITTED measurement records (VERDICT r9
  * task 7): a bench median with an unexplained bimodal spread, or a
  * scale-headroom ratio past linear×log, must not land silently — the
  * d9 79× and gr5 53× blowups sat invisible in green correctness runs
  * for a round. A query may carry such a number only if SCALE_HEADROOM.md
  * names it (i.e. someone wrote down the root cause or the input-density
  * explanation). Both files are committed artifacts, so this runs on
  * whatever the round is about to ship.
  */
class BenchRecordSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def readJson(path: String) = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(mapper.readTree(Files.readString(p))) else None
  }
  private lazy val headroomDoc: String = {
    val p = Paths.get("/root/repo/SCALE_HEADROOM.md")
    if (Files.exists(p)) Files.readString(p) else ""
  }

  test("no unexplained bimodal medians in the committed bench record") {
    readJson("/root/repo/bench_results.json") match {
      case None => cancel("no bench_results.json (fresh checkout)")
      case Some(root) =>
        val stats = root.path("stats")
        assume(stats.isObject, "record has no stats section")
        val offenders = stats.properties().asScala.toSeq.flatMap { e =>
          val times = e.getValue.path("times").elements().asScala
            .map(_.asDouble()).toSeq
          // Recompute with the CURRENT guard (the committed flag reflects
          // the rule at write time; tightening the rule must re-judge
          // history, or the next c1-shaped 2.99x median survives review).
          if (Bench.spreadSuspect(times) &&
              !headroomDoc.contains(e.getKey)) Some(e.getKey) else None
        }
        assert(offenders.isEmpty,
          s"bimodal bench medians with no SCALE_HEADROOM.md entry: " +
            s"${offenders.mkString(", ")} — explain or re-measure")
    }
  }

  test("no unexplained superlinear scale-headroom ratios") {
    readJson("/root/repo/scale_notes.json") match {
      case None => cancel("no scale_notes.json (fresh checkout)")
      case Some(root) =>
        // ~12x at 10x data = linear×log headroom; 4x is the review
        // threshold the round-9 verdict set for per-decade ratios.
        val limit = 4.0
        def offendersIn(queries: com.fasterxml.jackson.databind.JsonNode) =
          queries.properties().asScala.toSeq.flatMap { e =>
            val names = e.getValue.fieldNames().asScala.toSeq
            val ratios = names.filter(_.startsWith("ratio_at_"))
              .map(n => e.getValue.path(n).asDouble())
            if (ratios.exists(_ > limit) && !headroomDoc.contains(e.getKey))
              Some(e.getKey)
            else None
          }
        // both decades: the 10x section at the root, the 100x one nested
        val offenders = offendersIn(root.path("queries")) ++
          offendersIn(root.path("factor100").path("queries"))
        assert(offenders.isEmpty,
          s"scale ratios > ${limit}x with no SCALE_HEADROOM.md entry: " +
            s"${offenders.distinct.mkString(", ")} — name the fix or the " +
            s"input-density cause")
    }
  }
}
