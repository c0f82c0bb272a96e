package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the delta-gate prior recovery against both bench artifact
  * shapes. Round-6 verdict: the driver's BENCH_r{N}.json keeps only a
  * truncated TAIL of the bench line, so priors silently vanished for
  * ~90 of 117 queries, and the `"(q\w+)"` recovery pattern excluded
  * `rcm_pipeline` entirely — a 2× regression there would have passed
  * ungated. Bench now writes a COMPLETE twin to `bench/local_r{N}.json`
  * and prefers it; these tests pin both recovery paths and the sf
  * gate that keeps cross-scale medians out. */
class BenchArtifactSpec extends AnyFunSuite {

  private val fullArtifact =
    """{"metric":"total","value":9.5,"unit":"sec",
      |"total_excludes":["rcm_pipeline","q117_interval_join_streamed"],
      |"queries":{"q01_global_agg":0.11,"rcm_pipeline":7.4},
      |"errors":{},
      |"runs":{"q01_global_agg":[0.12,0.11,0.10],
      |"q30_minhash_lsh":[1.5,1.4,1.6,9.9],
      |"rcm_pipeline":[7.5,7.4,7.3]},
      |"runs_per_query":3,"stat":"median","delta_gate":{},
      |"loadavg_before":[1.0,1.0,1.0],"loadavg_after":[1.0,1.0,1.0],
      |"gc_ms":100,"sf":"/root/testdata/sf0.1"}""".stripMargin.replace("\n", "")

  test("complete local artifact: every runs{} entry yields a median, incl rcm_pipeline") {
    val m = Bench.mediansFromArtifact(fullArtifact, Some(0.1)).get
    assert(m("q01_global_agg") === 0.11)
    assert(m("rcm_pipeline") === 7.4)
    // even-length run list (spread-gate extra run) → mean of middle two
    assert(math.abs(m("q30_minhash_lsh") - 1.55) < 1e-9)
  }

  test("sf mismatch disables the gate (cross-sf medians would trip every query)") {
    assert(Bench.mediansFromArtifact(fullArtifact, Some(0.01)).isEmpty)
    assert(Bench.mediansFromArtifact(fullArtifact, None).isEmpty)
  }

  test("driver truncated-tail wrapper: runs regex-recovered, rcm_pipeline included") {
    // The driver wraps the LAST ~bytes of the printed line; queries{}
    // medians are gone but trailing runs arrays survive.
    val wrapper =
      """{"round":6,"sf":"/root/testdata/sf0.1","tail":
        |"8,1.61],\"q110_ivf_recall\":[0.52,0.50,0.55],
        |\"rcm_pipeline\":[7.49,7.37,7.21]},\"runs_per_query\":3}"}"""
        .stripMargin.replace("\n", "")
    val m = Bench.mediansFromArtifact(wrapper, Some(0.1)).get
    assert(m("q110_ivf_recall") === 0.52)
    assert(m("rcm_pipeline") === 7.37)
    // the leading partial array ("8,1.61]") must not produce a bogus entry
    assert(m.keySet === Set("q110_ivf_recall", "rcm_pipeline"))
  }

  test("full artifact preferred over tail when both shapes present") {
    // A complete artifact that ALSO carries a tail field (defensive):
    // runs{} wins, the tail is ignored.
    val both = fullArtifact.dropRight(1) +
      ""","tail":"\"q01_global_agg\":[9.0,9.0,9.0]"}"""
    val m = Bench.mediansFromArtifact(both, Some(0.1)).get
    assert(m("q01_global_agg") === 0.11)
  }

  test("same-round artifacts are ineligible as delta-gate priors") {
    // Round-9 verdict: the bench ran three times within round 9, the
    // later runs took their prior from the SAME round's rewrite of
    // local_r9.json, and the cross-round q90 1.56× regression never
    // tripped the gate. The prior must come from a strictly earlier
    // round; a same-round rewrite is a sibling run, not a prior.
    assert(!Bench.isPriorRound("local_r10.json", 10))
    assert(Bench.isPriorRound("local_r9.json", 10))
    assert(Bench.isPriorRound("BENCH_r9.json", 10))
    assert(!Bench.isPriorRound("BENCH_r10.json", 10))
    assert(!Bench.isPriorRound("BENCH_r11.json", 10)) // future: clock skew/manual copy
    assert(!Bench.isPriorRound("local.json", 10))     // no round digits
  }
}
