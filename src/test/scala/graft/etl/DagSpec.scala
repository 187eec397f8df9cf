package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class DagSpec extends AnyFunSuite {
  private def stage(name: String, deps: String*)(body: => Unit = ()) =
    Dag.Stage(name, deps, () => body)

  test("executes in dependency order, deterministically among ready stages") {
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    def s(n: String, deps: String*) = Dag.Stage(n, deps, () => { ran += n; () })
    // the reference's linear graph plus a fan-in: dims before fact
    val order = Dag.run(Seq(
      s("load_fact", "load_products", "load_customers"),
      s("load_customers", "check_files"),
      s("load_products", "check_files"),
      s("check_files", "check_env"),
      s("check_env")))
    assert(order == ran.toSeq)
    assert(order.head == "check_env" && order.last == "load_fact")
    assert(order.indexOf("check_files") < order.indexOf("load_customers"))
    // ready set {load_customers, load_products} runs in name order
    assert(order.indexOf("load_customers") < order.indexOf("load_products"))
  }

  test("lists every unknown dependency and duplicate in ONE error") {
    val e = intercept[ConfigError](Dag.run(Seq(
      stage("a", "ghost")(), stage("a")(), stage("b", "phantom")())))
    assert(e.getMessage.contains("duplicate stage(s): a"))
    assert(e.getMessage.contains("a->ghost"))
    assert(e.getMessage.contains("b->phantom"))
  }

  test("detects cycles naming ONLY the stages on the cycle") {
    val e = intercept[ConfigError](Dag.run(Seq(
      stage("x", "y")(), stage("y", "x")(),
      stage("downstream", "x")(), stage("ok")())))
    assert(e.getMessage == "dependency cycle among: x, y",
      s"got: ${e.getMessage}")
  }

  test("a failing stage retries per policy, then halts downstream work") {
    var attempts = 0
    var downstream = false
    val e = intercept[RuntimeException](Dag.run(Seq(
      Dag.Stage("flaky", Nil,
        () => { attempts += 1; throw new RuntimeException("boom") },
        retries = 2),
      Dag.Stage("after", Seq("flaky"), () => { downstream = true; () }))))
    assert(e.getMessage == "boom")
    assert(attempts == 3, "1 attempt + 2 retries")
    assert(!downstream, "downstream of a failed stage must not run")
  }
}
