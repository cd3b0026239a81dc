package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CI-shape guard over the COMMITTED measurement records (VERDICT r9
  * task 7, r10 task 5): a bench median with an unexplained bimodal
  * spread, a scale-headroom ratio past linear×log, or a cross-round
  * regression past 1.5× must not land silently — the d9 79× and gr5 53×
  * blowups sat invisible in green correctness runs for a round, and
  * r10's a3 3.17× regression was caught by the judge instead of a test.
  * A query may carry such a number only if SCALE_HEADROOM.md names it in
  * the STRUCTURED explanation table (the "## Named ratios" section, one
  * bold `**query_name**` per explained query) — whole-document substring
  * matching let historical "fixed in r9" prose silence the guard
  * forever (ADVICE r10). All files are committed artifacts, so this
  * runs on whatever the round is about to ship.
  */
class BenchRecordSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def readJson(path: String) = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(mapper.readTree(Files.readString(p))) else None
  }

  /** Query names explained in SCALE_HEADROOM.md's structured section:
    * bold tokens inside "## Named ratios" only. A name mentioned in
    * narrative prose elsewhere in the doc does NOT count — explaining an
    * anomaly means writing its entry into the table. */
  private lazy val knownAnomalies: Set[String] = {
    val p = Paths.get("/root/repo/SCALE_HEADROOM.md")
    val lines =
      if (Files.exists(p)) Files.readString(p).linesIterator.toSeq
      else Seq.empty
    val start = lines.indexWhere(_.startsWith("## Named ratios"))
    if (start < 0) Set.empty
    else {
      val rest = lines.drop(start + 1)
      val section = rest.indexWhere(_.startsWith("## ")) match {
        case -1 => rest
        case i  => rest.take(i)
      }
      val bold = "\\*\\*([a-z][a-z0-9_]+)\\*\\*".r
      section.flatMap(l => bold.findAllMatchIn(l).map(_.group(1))).toSet
    }
  }

  test("SCALE_HEADROOM.md has the structured Named-ratios section") {
    assert(knownAnomalies.nonEmpty,
      "SCALE_HEADROOM.md must keep a '## Named ratios' section with " +
        "bold **query_name** entries — it is the guard's allowlist")
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
              !knownAnomalies.contains(e.getKey)) Some(e.getKey) else None
        }
        assert(offenders.isEmpty,
          s"bimodal bench medians with no Named-ratios entry: " +
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
            if (ratios.exists(_ > limit) &&
                !knownAnomalies.contains(e.getKey)) Some(e.getKey)
            else None
          }
        // both decades: the 10x section at the root, the 100x one nested
        val offenders = offendersIn(root.path("queries")) ++
          offendersIn(root.path("factor100").path("queries"))
        assert(offenders.isEmpty,
          s"scale ratios > ${limit}x with no Named-ratios entry: " +
            s"${offenders.distinct.mkString(", ")} — name the fix or the " +
            s"input-density cause")
    }
  }

  test("no unexplained cross-round bench regressions > 1.5x") {
    // bench_baseline.json is the PRIOR round's accepted record (rolled
    // forward when a round's final bench is committed). r10 shipped a3
    // at 3.17x and gr2 at 1.39x the prior round's medians and only the
    // judge noticed; this catches the a3 class at commit time. Two
    // noise guards, both evidence-backed: the sub-second floor keeps
    // JIT/page-cache jitter on cheap queries out (the r10 verdict put
    // a8/v17's 1.5x+ swings in the noise band), and per-query ratios
    // are NORMALIZED by the suite's median ratio — whole measurement
    // windows drift ±25% on this box (r11 measured the same code at
    // 1.25x across two same-day windows), and a uniform shift is the
    // machine, not a regression. A query must be 1.5x worse than the
    // suite-typical drift to flag.
    val floorSec = 1.0
    val limit = 1.5
    (readJson("/root/repo/bench_results.json"),
     readJson("/root/repo/bench_baseline.json")) match {
      case (Some(cur), Some(base)) =>
        val curStats = cur.path("stats")
        val baseStats = base.path("stats")
        assume(curStats.isObject && baseStats.isObject)
        val ratios = curStats.properties().asScala.toSeq.flatMap { e =>
          val prior = baseStats.path(e.getKey).path("median")
          if (prior.isNumber && prior.asDouble() > 0)
            Some(e.getKey ->
              (e.getValue.path("median").asDouble(), prior.asDouble()))
          else None
        }
        assume(ratios.nonEmpty, "no overlapping queries with the baseline")
        val drift = {
          val rs = ratios.map { case (_, (now, prior)) => now / prior }.sorted
          rs(rs.size / 2)
        }
        // Normalization is CAPPED at the measured ±25%-per-window machine
        // drift (ADVICE r11): most suite queries share the Dedup/banding
        // substrate, so an unbounded max(drift, 1.0) would let a code
        // change that uniformly slows that substrate raise the suite
        // median and self-normalize away. A window genuinely slower than
        // the cap is a recordable event, not silent headroom: it needs
        // its own **suite_drift** Named-ratios entry.
        val driftCap = 1.3
        if (drift > driftCap)
          assert(knownAnomalies.contains("suite_drift"),
            f"suite-median drift $drift%.2fx exceeds the $driftCap%.1fx " +
              "machine window — a uniform slowdown of this size is either " +
              "a shared-substrate regression or an abnormal measurement " +
              "window; write the **suite_drift** Named-ratios entry")
        val norm = math.min(math.max(drift, 1.0), driftCap)
        val offenders = ratios.flatMap { case (q, (now, prior)) =>
          if (now > floorSec && now / prior > limit * norm &&
              !knownAnomalies.contains(q))
            Some(f"$q $prior%.2f -> $now%.2f s (suite drift $drift%.2fx)")
          else None
        }
        assert(offenders.isEmpty,
          s"cross-round regressions > ${limit}x the suite drift with no " +
            s"Named-ratios entry: ${offenders.mkString(", ")} — recover " +
            s"the time or write the root cause into SCALE_HEADROOM.md")
      case _ => cancel("bench_results.json or bench_baseline.json missing")
    }
  }

  test("no unexplained cumulative drift > 3x vs the pinned epoch record") {
    // The rolling guard above re-bases every round (bench_baseline.json
    // rolls forward), so a query can regress 1.4x per round FOREVER and
    // never flag — and its sub-second floor exempts cheap queries
    // entirely (se1/se3/d2/d3/t14 sat at 1.5-1.8x for a round with no
    // guard at all). bench_epoch.json is PINNED: per-query best-known
    // clean medians, committed once, never rolled forward — new queries
    // may be added, existing values only lowered. 3x headroom absorbs
    // window drift (measured up to ~2x on sub-second queries across
    // same-day windows) while a compounding regression eventually trips
    // it, floor or no floor.
    val limit = 3.0
    (readJson("/root/repo/bench_results.json"),
     readJson("/root/repo/bench_epoch.json")) match {
      case (Some(cur), Some(epoch)) =>
        val curStats = cur.path("stats")
        val epochStats = epoch.path("stats")
        assume(curStats.isObject && epochStats.isObject)
        val offenders = curStats.properties().asScala.toSeq.flatMap { e =>
          val pinned = epochStats.path(e.getKey).path("median")
          val now = e.getValue.path("median").asDouble()
          if (pinned.isNumber && pinned.asDouble() > 0 &&
              now / pinned.asDouble() > limit &&
              !knownAnomalies.contains(e.getKey))
            Some(f"${e.getKey} epoch ${pinned.asDouble()}%.2f -> " +
              f"$now%.2f s (${now / pinned.asDouble()}%.1fx)")
          else None
        }
        assert(offenders.isEmpty,
          s"cumulative drift > ${limit}x vs the pinned epoch with no " +
            s"Named-ratios entry: ${offenders.mkString(", ")} — the " +
            "regression compounded across rounds; recover it or name it")
      case _ => cancel("bench_results.json or bench_epoch.json missing")
    }
  }

  test("the epoch record is pinned: values never rise, queries never vanish") {
    // Guards the guard: a roll-forward of bench_epoch.json (raising a
    // value to silence the cumulative check) must fail loudly. The
    // baseline record rolls forward by design; the epoch must not.
    (readJson("/root/repo/bench_epoch.json"),
     readJson("/root/repo/bench_baseline.json")) match {
      case (Some(epoch), Some(base)) =>
        val eStats = epoch.path("stats")
        val bStats = base.path("stats")
        assume(eStats.isObject && bStats.isObject)
        // every baseline query the epoch covers must be pinned at or
        // below the baseline's median (the epoch is the historical best)
        val raised = eStats.properties().asScala.toSeq.flatMap { e =>
          val b = bStats.path(e.getKey).path("median")
          val ev = e.getValue.path("median").asDouble()
          if (b.isNumber && ev > b.asDouble() * 1.0001)
            Some(f"${e.getKey} epoch $ev%.2f > baseline ${b.asDouble()}%.2f")
          else None
        }
        assert(raised.isEmpty,
          s"epoch medians above the rolling baseline (epoch values may " +
            s"only be LOWERED): ${raised.mkString(", ")}")
      case _ => cancel("bench_epoch.json or bench_baseline.json missing")
    }
  }
}
