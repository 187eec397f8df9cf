package graft.etl

/** The "DAG" in ETL-DAG as a real task graph (reference D1-D2,
  * ETL_DAG.py:258-277): named stages with explicit dependencies,
  * validated (unknown deps, duplicates, cycles → ConfigError listing
  * every offender, the reference's fail-fast-with-all-errors style),
  * executed in deterministic topological order with per-stage retry
  * (D2: retries + delay).
  *
  * The reference's graph is linear (env check ≫ file check ≫ load);
  * this runner accepts any DAG shape so fan-out pipelines (load dims in
  * any order, fact after both — S8's FK ordering as edges, not
  * convention) express directly. Stages run on the DRIVER and launch
  * Spark jobs; the cluster parallelizes inside each stage, which is why
  * a sequential, deterministic driver loop is the right scheduler here
  * (same stance as Hierarchy.fixpoint).
  */
object Dag {

  final case class Stage(name: String, deps: Seq[String], run: () => Unit,
      retries: Int = 0, retryDelayMs: Long = 0)

  /** Validate and execute; returns stage names in execution order.
    * Deterministic: among ready stages, lexicographically first runs
    * first. Fails fast on the first stage whose retries are exhausted
    * (downstream stages never start — Airflow's default trigger rule). */
  def run(stages: Seq[Stage]): Seq[String] = {
    val names = stages.map(_.name)
    val dups = names.diff(names.distinct).distinct
    val known = names.toSet
    val unknown = stages.flatMap(s => s.deps.filterNot(known).map(d => s"${s.name}->$d"))
    val errors = (if (dups.nonEmpty) Seq(s"duplicate stage(s): ${dups.mkString(", ")}") else Nil) ++
      (if (unknown.nonEmpty) Seq(s"unknown dependenc(ies): ${unknown.mkString(", ")}") else Nil)
    if (errors.nonEmpty) throw new ConfigError(errors.mkString("; "))

    val byName = stages.map(s => s.name -> s).toMap
    val done = scala.collection.mutable.LinkedHashSet[String]()
    val remaining = scala.collection.mutable.Set[String](names: _*)
    while (remaining.nonEmpty) {
      val ready = remaining.toSeq.sorted
        .filter(n => byName(n).deps.forall(done.contains))
      if (ready.isEmpty) {
        // name only the stages actually ON a cycle, not everything merely
        // downstream of one: iteratively strip remaining stages that no
        // other remaining stage depends on (they can't be in a cycle)
        val cyc = scala.collection.mutable.Set(remaining.toSeq: _*)
        var stripped = true
        while (stripped) {
          val leaves = cyc.toSeq.filter(n =>
            !cyc.exists(m => m != n && byName(m).deps.contains(n)))
          stripped = leaves.nonEmpty
          cyc --= leaves
        }
        throw new ConfigError(
          s"dependency cycle among: ${cyc.toSeq.sorted.mkString(", ")}")
      }
      ready.foreach { n =>
        val s = byName(n)
        Retry.withRetry(s.retries, s.retryDelayMs)(s.run())
        done += n
        remaining -= n
      }
    }
    done.toSeq
  }
}
