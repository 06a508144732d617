package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-SF scaling gate's math and coverage (no Spark needed —
  * the measured line itself is Bench's `scaling` JSON output).
  */
class ScalingSpec extends AnyFunSuite {

  test("every gated query maps to a real operator family") {
    val orphans = SparkEntry.queries.keys.filter(q => Scaling.familyOf(q) == "other")
    assert(orphans.isEmpty, s"queries without a scaling family: ${orphans.toSeq.sorted}")
    // and the family space stays coarse enough to mean something
    val fams = SparkEntry.queries.keys.map(Scaling.familyOf).toSet
    assert(fams.size >= 5 && fams.size <= 12, fams.toString)
  }

  test("fitSlope recovers exact power-law exponents") {
    val sfs = Seq(0.001, 0.01, 0.1)
    def curve(exp: Double, c: Double) = sfs.map(s => (s, c * math.pow(s, exp)))
    assert(math.abs(Scaling.fitSlope(curve(1.0, 50.0)) - 1.0) < 1e-9)
    // c large enough that the smallest point clears the 1 ms clamp
    assert(math.abs(Scaling.fitSlope(curve(2.0, 5000.0)) - 2.0) < 1e-9)
    assert(math.abs(Scaling.fitSlope(curve(0.0, 3.0))) < 1e-9) // flat overhead
    // the clamp itself: a sub-millisecond reading flattens the fit
    // instead of blowing it up to -inf
    assert(Scaling.fitSlope(Seq((0.001, 0.0), (0.1, 1.0))).isFinite)
  }

  test("flagged: linear families pass, a material superlinear family is caught") {
    val sfs = Seq(0.001, 0.01, 0.1)
    def curve(exp: Double, c: Double) = sfs.map(s => (s, c * math.pow(s, exp)))
    val healthy = Map(
      "dedup"     -> curve(1.0, 30.0),  // linear, 3 s at sf0.1
      "ann"       -> curve(0.3, 2.0),   // overhead-dominated
      "textstats" -> curve(1.1, 40.0))  // near-linear, inside tolerance
    assert(Scaling.flagged(healthy) == Seq.empty, Scaling.flagged(healthy).toString)
    // a quadratic family with real absolute cost is flagged...
    val sick = healthy + ("pairspace" -> curve(2.0, 400.0)) // 4 s at sf0.1
    assert(Scaling.flagged(sick) == Seq("pairspace"))
    // ...but a noise-level quadratic (20 ms at the top SF) is not —
    // fixed-overhead jitter must not trip the gate
    val tiny = healthy + ("jitter" -> curve(2.0, 2.0))
    assert(Scaling.flagged(tiny) == Seq.empty)
  }
}
