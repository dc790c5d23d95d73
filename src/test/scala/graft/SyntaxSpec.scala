package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Axis
import graft.syntax._

/** Accessor-style API (the reference's `df.pita...` chain shape). */
class SyntaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("df.flat(...).addTotals chains like the reference accessor") {
    val df = Seq(("a", 1L, 2L), ("b", 3L, 4L)).toDF("k", "x", "y")
    val out = df.flat("k").addTotals(Axis.Both).ordered.collect()
    assert(out.length == 3)
    assert(out.last.getString(0) == "Totals")
    assert(out.last.getLong(3) == 10L) // grand total corner
  }

  test("pita alias and valueCounts accessor") {
    val df = Seq("x", "x", "y").toDF("c")
    val vc = df.valueCounts("c", addPct = true).ordered.collect()
    assert(vc.map(_.getString(0)).toSeq == Seq("x", "y", "Totals"))
    val pivoted = Seq(("a", "l", 1.0), ("a", "r", 2.0), ("b", "l", 3.0))
      .toDF("k", "s", "v")
      .pivotTable(Seq("k"), "s", org.apache.spark.sql.functions.sum($"v"))
    assert(pivoted.meta.valueCols == Seq("l", "r"))
  }
}
