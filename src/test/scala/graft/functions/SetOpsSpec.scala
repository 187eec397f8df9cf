package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{array_intersect, col, size, sort_array}

class SetOpsSpec extends SparkSpec {
  import SortedIntersectSize.sorted_intersect_size
  import spark.implicits._

  test("two-pointer kernel agrees with Set intersection on random sets") {
    val rnd = new scala.util.Random(42) // seeded: deterministic run
    (1 to 200).foreach { _ =>
      val a = List.fill(rnd.nextInt(30))(rnd.nextInt(201) - 100).distinct.sorted
      val b = List.fill(rnd.nextInt(30))(rnd.nextInt(201) - 100).distinct.sorted
      val viaKernel = SetOps.sortedIntersectSize(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray))
      assert(viaKernel == a.toSet.intersect(b.toSet).size.toLong,
        s"a=$a b=$b")
    }
  }

  test("expression matches array_intersect inside a real plan, codegen on") {
    val rows = Seq(
      (1L, Seq(1, 3, 5, 7), Seq(3, 4, 5, 9)),
      (2L, Seq.empty[Int], Seq(1, 2)),
      (3L, Seq(2, 4), Seq(2, 4)),
      (4L, Seq(1, 2, 3), Seq(4, 5, 6))
    ).toDF("id", "a", "b")
    val got = rows.select(col("id"),
        sorted_intersect_size(sort_array(col("a")), sort_array(col("b"))).as("n"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id=${r.getLong(0)}: kernel=${r.getLong(1)} builtin=${r.getLong(2)}"))
  }

  test("registered as a SQL function via GraftExtensions") {
    val n = spark.sql(
      "SELECT sorted_intersect_size(array(1, 3, 5), array(3, 5, 9)) AS n")
      .collect()(0).getLong(0)
    assert(n == 2L)
  }

  test("null in either child yields null") {
    val rows = Seq((1L, Some(Seq(1, 2)), None: Option[Seq[Int]]))
      .toDF("id", "a", "b")
    val r = rows.select(sorted_intersect_size(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
