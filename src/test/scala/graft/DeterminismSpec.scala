package graft

/** Run-to-run determinism: the oracle gate only proves a single run
  * matches DuckDB; this proves a SECOND run matches the first — the
  * property that catches nondeterministic ids, RNG, or unstable tie
  * orders leaking into declared output. */
class DeterminismSpec extends SparkSpec {

  test("every declared query is run-to-run deterministic at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf001).collect().map(_.toString).toSeq
      val b = fn(spark, sf001).collect().map(_.toString).toSeq
      assert(a == b, s"$name varies across runs: " +
        a.zip(b).find { case (x, y) => x != y }.toString)
    }
  }
}
