package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.testing.MakeTestDf
import graft.transforms.Shaping

/** Index/column shaping + margin-mask laws (reference axes.py, chaining.py,
  * tooling.py).
  */
class ShapingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sortTotals pins margins last within each group; first when aggregatesLast=false (axes.py:118-132)") {
    val ft = MakeTestDf(spark, nRows = 7, nCols = 2, idxDupes = Seq(4, 1))
      .addSubtotals(Axis.Rows, Seq(0)).addTotals(Axis.Rows)
    val last = ft.sortTotals().df.collect()
    assert(last.last.getString(0) == "Totals")
    val g0 = last.filter(_.getString(0) == "R_L0_G0")
    assert(g0.last.getString(1) == "Subtotals")
    val first = ft.sortTotals(aggregatesLast = false).df.collect()
    assert(first.head.getString(0) == "Totals")
  }

  test("margin mask matches by equality AND string prefix (chaining.py:32-47)") {
    val meta = TableMeta(Seq("R0"), Seq(ColKey("c0", Seq("c0"))))
      .withMargin("totals", "Totals")
    val df = Seq("plain", "Totals", "Totals 2024", "Tot", "xTotals")
      .toDF("R0").withColumn("c0", lit(1L))
    val masked = df.filter(MarginMask.isMargin(meta)).collect().map(_.getString(0)).toSet
    assert(masked == Set("Totals", "Totals 2024"))
  }

  test("addLevel inserts a constant row level at a position, negative supported (axes.py:210-336)") {
    val ft = MakeTestDf(spark)
    val lv = ft.addLevel("2024", 0, Some("year"))
    assert(lv.meta.indexLevels == Seq("year", "R0"))
    assert(lv.ordered.collect().forall(_.getString(0) == "2024"))
    val lvNeg = ft.addLevel("z", -1, Some("tail"))
    assert(lvNeg.meta.indexLevels == Seq("R0", "tail"))
  }

  test("addLevel on the column axis rewrites keys only (no shuffle)") {
    val ft = MakeTestDf(spark)
    val lv = ft.addLevel("vals", 0, Some("kind"), Axis.Cols)
    assert(lv.meta.columns.forall(_.key.head == "vals"))
    assert(lv.df eq ft.df) // metadata-only
  }

  test("sortIndexFromList: explicit order first, unlisted after by value (tooling.py:111-118)") {
    val ft = MakeTestDf(spark) // r0..r4
    val out = Shaping.sortIndexFromList(ft, Seq("r3", "r1")).df
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("r3", "r1", "r0", "r2", "r4"))
  }

  test("offsetDateField aligns every year group onto the max year (tooling.py:76-94)") {
    val df = Seq(
      ("2019-03-15", 2019), ("2020-03-15", 2020), ("2021-03-15", 2021)
    ).toDF("d", "y").withColumn("d", to_date(col("d")))
    val out = Shaping.offsetDateField(df, "d", "y")
      .select(year(col("d"))).collect().map(_.getInt(0)).toSet
    assert(out == Set(2021))
  }

  test("sortAggregates on columns is a stable metadata reorder") {
    val ft = MakeTestDf(spark).addTotals(Axis.Cols)
    // move Totals column first
    val sorted = ft.sortAggregates(Axis.Cols, aggregatesLast = false)
    assert(sorted.meta.valueCols.head == "Totals")
    assert(sorted.meta.valueCols.tail == Seq("c0", "c1", "c2", "c3"))
  }

  test("column-axis levels resolve by NAME against recorded colNames (axes.py:11-26 under transpose)") {
    // a pivot records the pivot column's name in TableMeta.colNames; the
    // reference's Level = int | str contract applies on EITHER axis, so
    // sort_totals(axis=1, level='status') must resolve the name, same as a
    // row level would
    val df = Seq(("r1", "F", 1.0), ("r1", "O", 2.0), ("r2", "F", 3.0))
      .toDF("flag", "status", "v")
    val ft = graft.pivot.Pivot.pivot(df, Seq("flag"), "status",
      sum(col("v")), Seq("F", "O")).addTotals(Axis.Cols)
    val byName = ft.sortTotals(Axis.Cols, aggregatesLast = false,
      level = Some(Level.Named("status")))
    val byPos = ft.sortTotals(Axis.Cols, aggregatesLast = false,
      level = Some(Level.Pos(0)))
    assert(byName.meta.valueCols == byPos.meta.valueCols)
    assert(byName.meta.valueCols.head == "Totals")
    val err = intercept[IllegalArgumentException] {
      ft.sortTotals(Axis.Cols, level = Some(Level.Named("nonexistent")))
    }
    assert(err.getMessage.contains("no column level named"))
  }

  test("addLevel accepts non-string scalars with native types (axes.py value: Any)") {
    val ft = MakeTestDf(spark)
    val lv = ft.addLevel(2024, 0, Some("year"))
    assert(lv.meta.indexLevels == Seq("year", "R0"))
    assert(lv.df.schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(lv.ordered.collect().forall(_.getInt(0) == 2024))
    // column axis renders non-strings into the (string) column keys
    val cv = ft.addLevel(7L, 0, Some("k"), Axis.Cols)
    assert(cv.meta.columns.forall(_.key.head == "7"))
  }

  test("addLevelValues assigns positional values by canonical row order (axes.py:252-258)") {
    val ft = MakeTestDf(spark) // rows r0..r4 in canonical order
    val lv = ft.addLevelValues(Seq("a", "b", "c", "d", "e"), 0, Some("tag"))
    assert(lv.meta.indexLevels == Seq("tag", "R0"))
    val got = lv.ordered.select("R0", "tag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("r0" -> "a", "r1" -> "b", "r2" -> "c", "r3" -> "d", "r4" -> "e"))
    // length mismatch raises like the reference ValueError
    val err = intercept[IllegalArgumentException] {
      ft.addLevelValues(Seq("a", "b"), 0, Some("tag"))
    }
    assert(err.getMessage.contains("must match"))
    // column axis: positional per column, metadata only
    val cv = ft.addLevelValues(Seq("p", "q", "r", "s"), 0, Some("k"), Axis.Cols)
    assert(cv.meta.columns.map(_.key.head) == Seq("p", "q", "r", "s"))
    assert(cv.df eq ft.df)
  }

  test("sortAggregates(level=, sortRemaining=) sorts only the chosen level (axes.py:58-132)") {
    val ft = MakeTestDf(spark, nRows = 8, nCols = 2, idxDupes = Seq(4, 1))
      .addSubtotals(Axis.Rows, Seq(0))
    // level 1 with sortRemaining=false: Subtotals pinned last within the
    // level-1 ordering; level-0 left to its own values is not re-keyed
    val sorted = ft.sortAggregates(Axis.Rows, level = Some(1), sortRemaining = false)
      .df.collect()
    // all Subtotals rows sort after all data rows of the level-1 ordering
    val l1 = sorted.map(_.getString(1)).toSeq
    assert(l1.last == "Subtotals")
    // with sortRemaining=true the outer level groups stay contiguous
    val grouped = ft.sortAggregates(Axis.Rows, level = Some(0), sortRemaining = true)
      .df.collect().map(_.getString(0)).toSeq
    assert(grouped == grouped.sorted)
  }

  test("reindexByLevels aligns column order to a reference table (tooling.py:121-156)") {
    val ft = MakeTestDf(spark) // columns c0..c3
    val shuffledCols = ft.meta.copy(columns =
      Seq("c3", "c0", "c2", "c1").map(c => ColKey(c, Seq(c))))
    val target = FlatTable(ft.df, shuffledCols)
    val realigned = target.reindexByLevels(ft)
    assert(realigned.meta.valueCols == Seq("c0", "c1", "c2", "c3"))
    // columns absent from the reference are dropped (pandas reindex)
    val ref2 = FlatTable(ft.df, ft.meta.copy(columns =
      Seq("c1", "c0").map(c => ColKey(c, Seq(c)))))
    assert(target.reindexByLevels(ref2).meta.valueCols == Seq("c1", "c0"))
  }

  test("levels address by name or position (types.py Level = int|str)") {
    val ft = MakeTestDf(spark, nRows = 8, nCols = 2, idxDupes = Seq(4, 1))
    val byName = ft.addSubtotals(Axis.Rows, Seq("R0"))
    val byPos = ft.addSubtotals(Axis.Rows, Seq(0))
    assert(byName.ordered.collect().map(_.toSeq).toSeq ==
      byPos.ordered.collect().map(_.toSeq).toSeq)
    val sorted = byName.sortAggregates(Axis.Rows, level = Some("R1"),
      sortRemaining = false)
    assert(sorted.df.collect().last.getString(1) == "Subtotals")
    intercept[IllegalArgumentException] {
      ft.addSubtotals(Axis.Rows, Seq("nope"))
    }
  }

  test("canonical order is deterministic under repartition (shuffle-safety)") {
    val ft = MakeTestDf(spark, nRows = 7, nCols = 2, idxDupes = Seq(4, 1))
      .addSubtotals(Axis.Rows, Seq(0)).addTotals(Axis.Rows)
    val a = ft.ordered.collect().map(_.toSeq).toSeq
    val b = FlatTable(ft.df.repartition(7), ft.meta).ordered.collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
