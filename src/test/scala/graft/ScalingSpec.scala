package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-trend gate: `graft.Bench` in dual-SF mode
  * (SPARK_GRAFT_SCALING_DIRS=sf0.01,sf0.1) writes SCALING.json with a
  * per-query big/small time ratio and a `flagged` map of queries whose
  * ratio exceeds the superlinearity threshold (default 15× for the 10×
  * row growth). This spec holds the line on the last recorded run: a
  * flagged query means some plan went superlinear in a way the
  * plan-shape pins can't see. Cancels (does not pass vacuously) when no
  * SCALING.json has been produced yet.
  */
class ScalingSpec extends AnyFunSuite {

  test("no query's sf0.01→sf0.1 time ratio is superlinear (SCALING.json)") {
    val p = java.nio.file.Paths.get("SCALING.json")
    assume(java.nio.file.Files.exists(p),
      "SCALING.json absent — run Bench with SPARK_GRAFT_SCALING_DIRS first")
    val json = java.nio.file.Files.readString(p)
    val flagged = """"flagged":\{([^}]*)\}""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("MISSING")
    assert(flagged == "",
      s"superlinear scale trend flagged: {$flagged}")
  }
}
