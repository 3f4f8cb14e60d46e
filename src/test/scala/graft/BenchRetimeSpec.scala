package graft

import org.scalatest.funsuite.AnyFunSuite

/** r11: Bench's self-adjudicating outlier re-run (r10 verdict #2) —
  * the prior-readings parser must pull exactly the per-query seconds
  * out of a committed bench_out.json line, including one that already
  * carries a `retimed` object (whose array values must NOT re-parse
  * as readings). */
class BenchRetimeSpec extends AnyFunSuite {

  val line =
    """{"metric":"total","value":96.3,"unit":"sec","queries":{"q17_event_window":0.31,""" +
      """"q78_cube":1.74,"q9_ratio_analytics":0.12},""" +
      """"retimed":{"q78_cube":[1.74,0.42]},"canary_s":[0.85,1.30],"sf":"/root/testdata/sf0.1"}"""

  test("priorReadings pulls per-query seconds, skipping retimed arrays") {
    val m = Bench.priorReadings(line)
    assert(m == Map("q17_event_window" -> 0.31, "q78_cube" -> 1.74,
      "q9_ratio_analytics" -> 0.12))
  }

  test("priorReadings tolerates a missing/garbled file body") {
    assert(Bench.priorReadings("").isEmpty)
    assert(Bench.priorReadings("not json at all").isEmpty)
  }

  test("bestReadings pulls the best object; priorReadings stays scoped to queries") {
    // the r11 escape: the mid-round line's `queries` carried q78 at an
    // inflated 1.74s while the monotone `best` still holds 0.42 — the
    // retime reference must see 0.42, so priorReadings must NOT leak
    // best values and bestReadings must NOT leak queries values
    val withBest = line.replace(""","canary_s"""",
      ""","best":{"q17_event_window":0.29,"q78_cube":0.42},"canary_s"""")
    assert(Bench.priorReadings(withBest) == Map("q17_event_window" -> 0.31,
      "q78_cube" -> 1.74, "q9_ratio_analytics" -> 0.12))
    assert(Bench.bestReadings(withBest) == Map("q17_event_window" -> 0.29,
      "q78_cube" -> 0.42))
    // a line without a best object (r11-era file): empty, not a crash
    assert(Bench.bestReadings(line).isEmpty)
  }

  test("resetBest lifts a stale pre-reparam best exactly once (r15 verdict #1)") {
    // first run after the q145 re-parameterization: stale 2.49 carried
    // from the obsolete M=4/first-N config is floored at the 5.69
    // BASELINE.md anchor; an untouched query passes through
    val (b1, applied1) = Bench.resetBest(
      Map("q145_ann_ivfpq" -> 2.49, "q78_cube" -> 0.42), Set.empty)
    assert(b1("q145_ann_ivfpq") == 5.69)
    assert(b1("q78_cube") == 0.42)
    assert(applied1.contains("q145_ann_ivfpq"))
    // later run: the NEW config legitimately earned 4.5 < 5.69 — the
    // already-applied reset must NOT re-floor it away
    val (b2, _) = Bench.resetBest(Map("q145_ann_ivfpq" -> 4.5), applied1)
    assert(b2("q145_ann_ivfpq") == 4.5)
    // a best already above the floor is never touched
    val (b3, _) = Bench.resetBest(Map("q145_ann_ivfpq" -> 6.1), Set.empty)
    assert(b3("q145_ann_ivfpq") == 6.1)
  }

  test("appliedResets round-trips through the emitted line") {
    val withResets = line.replace(""","canary_s"""",
      ""","best_reset":["q145_ann_ivfpq","q241_ivfpq_recall"],"canary_s"""")
    assert(Bench.appliedResets(withResets) ==
      Set("q145_ann_ivfpq", "q241_ivfpq_recall"))
    assert(Bench.appliedResets(line).isEmpty)
    assert(Bench.appliedResets("").isEmpty)
  }

  test("the committed r10 artifact parses and covers the full suite") {
    val path = java.nio.file.Paths.get("bench_out.json")
    if (java.nio.file.Files.exists(path)) {
      val m = Bench.priorReadings(java.nio.file.Files.readString(path))
      assert(m.size >= 100, s"only ${m.size} readings parsed")
      assert(m.keySet.subsetOf(SparkEntry.queries.keySet ++ m.keySet))
    }
  }
}
