package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.testing.MakeTestDf

/** Margin semantics, mirroring the reference's tests/transforms/test_totals.py
  * assertion bodies (see SURVEY.md §5) on make_test_df fixtures.
  */
class TotalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def f1 = MakeTestDf(spark) // 5x4 simple (FIXTURES F1)
  private def f3 = MakeTestDf(spark, nRows = 7, nCols = 4,
    idxDupes = Seq(4, 2, 1), colDupes = Seq(2, 1)) // FIXTURES F3

  private def rowsOf(ft: FlatTable): Seq[Row] = ft.ordered.collect().toSeq

  test("totals row equals per-column sums (test_totals.py:21-27)") {
    val ft = f1
    val base = ft.df.collect()
    val sums = (0 until 4).map(c => base.map(_.getLong(c + 1)).sum)
    val out = rowsOf(ft.addTotals(Axis.Rows))
    assert(out.size == 6)
    val tot = out.last
    assert(tot.getString(0) == "Totals")
    assert((0 until 4).map(c => tot.getLong(c + 1)) == sums)
  }

  test("axis=Both corner cell is the grand total (test_totals.py:33-36)") {
    val ft = f1
    val grand = ft.df.collect().map(r => (1 to 4).map(r.getLong).sum).sum
    val out = rowsOf(ft.addTotals(Axis.Both))
    assert(out.last.getLong(5) == grand)
    // and the Totals column of each data row is its row sum; integer inputs
    // keep an integer total (dtype preservation, readme.md:13)
    out.dropRight(1).foreach { r =>
      assert(r.getLong(5) == (1 to 4).map(r.getLong).sum)
    }
  }

  test("custom label (test_totals.py:44-47)") {
    val out = rowsOf(f1.addTotals(Axis.Rows, label = "Overall"))
    assert(out.last.getString(0) == "Overall")
  }

  test("ignore_keys excludes rows from sums, including prefix matches (test_totals.py:49-61, chaining.py:37-42)") {
    import org.apache.spark.sql.functions._
    val ft = f1
    val polluted = FlatTable(
      ft.df.unionByName(spark.range(1).select(
        lit("To be ignored").as("R0"), lit(999L).as("c0"), lit(999L).as("c1"),
        lit(999L).as("c2"), lit(999L).as("c3"))),
      ft.meta)
    val clean = ft.df.collect()
    val sums = (0 until 4).map(c => clean.map(_.getLong(c + 1)).sum)
    val out = rowsOf(polluted.addTotals(Axis.Rows, ignoreKeys = Seq("To be ignored")))
    val tot = out.find(_.getString(0) == "Totals").get
    assert((0 until 4).map(c => tot.getLong(c + 1)) == sums)
    // prefix semantics: a row labeled "To be ignored (extra)" is also masked
    val polluted2 = FlatTable(
      polluted.df.unionByName(spark.range(1).select(
        lit("To be ignored (extra)").as("R0"), lit(111L).as("c0"),
        lit(111L).as("c1"), lit(111L).as("c2"), lit(111L).as("c3"))),
      ft.meta)
    val out2 = rowsOf(polluted2.addTotals(Axis.Rows, ignoreKeys = Seq("To be ignored")))
    val tot2 = out2.find(_.getString(0) == "Totals").get
    assert((0 until 4).map(c => tot2.getLong(c + 1)) == sums)
  }

  test("subtotals equal per-group sums and sit inside their group (test_totals.py:115-143)") {
    val ft = f3
    val base = ft.df.collect()
    val byGroup = base.groupBy(_.getString(0)).view.mapValues(rs =>
      (0 until 4).map(c => rs.map(_.getLong(c + 3)).sum)).toMap
    val out = rowsOf(ft.addSubtotals(Axis.Rows, levels = Seq(0)))
    // G0 has 4 data rows -> subtotal row; G1 has 3 -> subtotal row
    val subRows = out.filter(_.getString(1) == "Subtotals")
    assert(subRows.size == 2)
    subRows.foreach { r =>
      assert((0 until 4).map(c => r.getLong(c + 3)) == byGroup(r.getString(0)))
    }
    // placement: each subtotal row directly follows its group's data rows
    val g0End = out.lastIndexWhere(r => r.getString(0) == "R_L0_G0")
    assert(out(g0End).getString(1) == "Subtotals")
  }

  test("multi-level subtotals, innermost labels distinct (test_totals.py:145-151)") {
    val ft = f3
    val out = rowsOf(ft.addSubtotals(Axis.Rows, levels = Seq(0, 1),
      skipSingleRows = false))
    val lvl0Subs = out.filter(_.getString(1).startsWith("Subtotals"))
      .filter(_.getString(2) == "")
    val lvl1Subs = out.filter(r => r.getString(2).startsWith("Subtotals"))
    assert(lvl0Subs.nonEmpty && lvl1Subs.nonEmpty)
  }

  test("totals and subtotals commute (test_totals.py:153-164)") {
    val a = f3.addTotals(Axis.Rows).addSubtotals(Axis.Rows, Seq(0))
    val b = f3.addSubtotals(Axis.Rows, Seq(0)).addTotals(Axis.Rows)
    assert(rowsOf(a).map(_.toSeq) == rowsOf(b).map(_.toSeq))
  }

  test("skip_single_rows skips 1-row groups at the grouped level (test_totals.py:176-179)") {
    val ft = f3 // level-1 group R_L1_G3 has exactly 1 row
    val out = rowsOf(ft.addSubtotals(Axis.Rows, levels = Seq(1)))
    val subs = out.filter(_.getString(2) == "Subtotals")
    assert(subs.size == 3) // G0,G1,G2 have 2 rows; G3 skipped
    val all = rowsOf(ft.addSubtotals(Axis.Rows, levels = Seq(1),
      skipSingleRows = false))
    assert(all.count(_.getString(2) == "Subtotals") == 4)
  }

  test("include_level_name suffixes the group value (test_totals.py:192-201)") {
    val out = rowsOf(f3.addSubtotals(Axis.Rows, levels = Seq(0),
      includeLevelName = true))
    assert(out.exists(_.getString(1) == "Subtotals R_L0_G0"))
  }

  test("drop_totals removes margin rows (totals.py:255-262)") {
    val ft = f1.addTotals(Axis.Both)
    val dropped = ft.dropTotals()
    val out = rowsOf(dropped)
    assert(out.size == 5)
    assert(!out.exists(_.getString(0) == "Totals"))
    // the Totals *column* survives (mask is row-axis only)
    assert(dropped.meta.valueCols.contains("Totals"))
  }

  test("margin key collision raises (aggregation.py:73-79)") {
    val ft = f1.addTotals(Axis.Rows)
    intercept[IllegalArgumentException] { ft.addTotals(Axis.Rows) }
  }

  test("column-axis subtotals per top-level column group (totals.py axis=1)") {
    val ft = f3 // columns: (C_L0_G0: c0,c1), (C_L0_G1: c2,c3)
    val st = ft.addSubtotals(Axis.Cols, levels = Seq(0))
    assert(st.meta.valueCols.size == 6)
    val out = st.ordered.collect()
    out.foreach { r =>
      // subtotal columns placed after their group: c0,c1,sub0,c2,c3,sub1
      assert(r.getLong(5) == r.getLong(3) + r.getLong(4))
      assert(r.getLong(8) == r.getLong(6) + r.getLong(7))
    }
  }

  test("generic aggregate margins: mean/max rows via aggfunc registry (A1)") {
    val ft = f1
    val base = ft.df.collect()
    val out = rowsOf(ft.addAgg("mean").addAgg("max"))
    val mean = out.find(_.getString(0) == "mean").get
    val mx = out.find(_.getString(0) == "max").get
    val c0 = base.map(_.getLong(1))
    assert(math.abs(mean.getDouble(1) - c0.sum.toDouble / c0.size) < 1e-12)
    assert(mx.getDouble(1) == c0.max.toDouble)
  }

  test("releaseForked frees the margin fork's checkpoint blocks explicitly") {
    // ADVICE r16: chained margin ops checkpoint each intermediate union;
    // a long interactive session needs a release path that doesn't wait
    // for the ContextCleaner. Before release the checkpoint RDD must be
    // registered as persistent; after, gone. A never-materialized fork is
    // a no-op (releaseForked must not CREATE the checkpoint to free it).
    val sc = spark.sparkContext
    val fresh = f1
    val before = sc.getPersistentRDDs.keySet
    fresh.releaseForked(blocking = true) // not materialized: no-op
    assert(sc.getPersistentRDDs.keySet == before)
    val ft = fresh.addTotals(Axis.Rows)
    ft.ordered.collect() // materializes fresh.forked
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "margin chain should have registered a local checkpoint")
    fresh.releaseForked(blocking = true)
    assert((sc.getPersistentRDDs.keySet & added).isEmpty,
      "explicit release must drop the fork's blocks without waiting for GC")
  }
}
