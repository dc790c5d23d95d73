package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.pivot.Pivot
import graft.testing.MakeTestDf

/** Percentage-view semantics, mirroring tests/transforms/test_percentages.py
  * (axis definitions, sums-to-base, apportioned vs naive rounding).
  */
class PercentagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withTotals = MakeTestDf(spark).addTotals(Axis.Both)

  test("default base is 1 — fractions, reference parity (config.defaults.json:18)") {
    assert(Defaults.base == 1)
    val pct = withTotals.asPercentages(Axis.Rows) // no base argument
    val data = pct.dataRows().collect()
    (1 to 5).foreach { c =>
      val colSum = data.map(_.getDouble(c)).sum
      assert(math.abs(colSum - 1.0) < 1e-9, s"col $c sums to $colSum")
    }
    // the config layer can restore 0-100 scaling globally
    try {
      graft.config.FlatbreadConf.updateRuntime("base" -> "100")
      val scaled = withTotals.asPercentages(Axis.Rows).dataRows().collect()
      assert(math.abs(scaled.map(_.getDouble(1)).sum - 100.0) < 1e-9)
    } finally graft.config.FlatbreadConf.reset()
  }

  test("axis=0 (Rows): each column sums to base over data rows (test_percentages.py:154-188)") {
    val pct = withTotals.asPercentages(Axis.Rows, base = 100)
    val data = pct.dataRows().collect()
    (1 to 5).foreach { c =>
      val colSum = data.map(_.getDouble(c)).sum
      assert(math.abs(colSum - 100.0) < 1e-9, s"col $c sums to $colSum")
    }
    // the totals row itself becomes base
    val tot = pct.ordered.collect().last
    assert(math.abs(tot.getDouble(1) - 100.0) < 1e-9)
  }

  test("axis=1 (Cols): each row sums to base across data columns") {
    val pct = withTotals.asPercentages(Axis.Cols, base = 100)
    pct.ordered.collect().foreach { r =>
      val rowSum = (1 to 4).map(r.getDouble).sum
      assert(math.abs(rowSum - 100.0) < 1e-9)
      assert(math.abs(r.getDouble(5) - 100.0) < 1e-9) // Totals col -> base
    }
  }

  test("axis=2 (Both): grand corner becomes base, all cells sum to base") {
    val pct = withTotals.asPercentages(Axis.Both, base = 100)
    val out = pct.ordered.collect()
    assert(math.abs(out.last.getDouble(5) - 100.0) < 1e-9)
    val dataCells = out.dropRight(1).flatMap(r => (1 to 4).map(r.getDouble))
    assert(math.abs(dataCells.sum - 100.0) < 1e-9)
  }

  test("apportioned rounding sums exactly to base; naive rounding loses it (test_percentages.py:192-223)") {
    // F5: three cells of 100/3 + Totals row (FIXTURES.md)
    val df = Seq(("r0", 100.0 / 3), ("r1", 100.0 / 3), ("r2", 100.0 / 3))
      .toDF("R0", "c0")
    val ft = FlatTable(df, 1).addTotals(Axis.Rows)
    val app = ft.asPercentages(Axis.Rows, ndigits = 0, base = 100,
      apportioned = Some(true))
    val appSum = app.dataRows().collect().map(_.getDouble(1)).sum
    assert(appSum == 100.0) // exactly
    val naive = ft.asPercentages(Axis.Rows, ndigits = 0, base = 100,
      apportioned = Some(false))
    val naiveSum = naive.dataRows().collect().map(_.getDouble(1)).sum
    assert(naiveSum == 99.0) // 33+33+33
  }

  test("rounding preserves NA positions (percentages.py:418-419)") {
    val df = Seq(("r0", Some(30.0)), ("r1", None), ("r2", Some(70.0)))
      .toDF("R0", "c0")
    val ft = FlatTable(df, 1).addTotals(Axis.Rows)
    val pct = ft.asPercentages(Axis.Rows, ndigits = 1, base = 100,
      apportioned = Some(true))
    val rows = pct.ordered.collect()
    assert(rows(1).isNullAt(1)) // r1 stays null
    assert(rows(0).getDouble(1) == 30.0 && rows(2).getDouble(1) == 70.0)
  }

  test("add_percentages keeps values and adds a pct block with an outer {n,pct} level (percentages.py:369-371)") {
    val ft = withTotals.addPercentages(Axis.Cols, base = 100)
    val meta = ft.meta
    assert(meta.valueCols.size == 10) // 5 n + 5 pct
    assert(meta.columns.take(5).forall(_.key.head == "n"))
    assert(meta.columns.drop(5).forall(_.key.head == "pct"))
    val r = ft.ordered.collect().head
    // pct col of c0 = c0 / Totals * 100 (n block keeps its integer dtype)
    assert(math.abs(r.getDouble(6) - r.getLong(1).toDouble / r.getLong(5) * 100) < 1e-9)
  }

  test("interleaf moves the n/pct level innermost and interleaves columns (percentages.py:378-386)") {
    val ft = withTotals.addPercentages(Axis.Cols, interleaf = true)
    val keys = ft.meta.columns.map(_.key)
    assert(keys(0) == Seq("c0", "n") && keys(1) == Seq("c0", "pct"))
    assert(ft.meta.valueCols.take(2) == Seq("c0", "pct__c0"))
  }

  test("value_counts: null bucket, Totals row, pct column (accessors/series.py:109-151)") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None, Some("a"))
      .toDF("x")
    val vc = Pivot.valueCounts(df, "x", addPct = true, base = 100)
    val rows = vc.ordered.collect()
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("<NA>" -> 1L, "a" -> 3L, "b" -> 1L, "Totals" -> 5L))
    val aPct = rows.find(_.getString(0) == "a").get.getDouble(2)
    assert(math.abs(aPct - 60.0) < 1e-9)
  }

  test("value_counts with fillna=None drops nulls") {
    val df = Seq(Some("a"), None, Some("b")).toDF("x")
    val vc = Pivot.valueCounts(df, "x", fillna = None)
    val m = vc.ordered.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 1L, "b" -> 1L, "Totals" -> 2L))
  }

  test("grouped apportionment: per-group sums preserved with a partitioned window (scale guardrail)") {
    val rnd = new scala.util.Random(11)
    val rows = for (g <- 0 until 4; i <- 0 until 5)
      yield (f"g$g", f"r$i", rnd.nextDouble() * 40)
    val df = rows.toDF("G", "R", "c0")
    val ft = FlatTable(df, 2)
    val rounded = graft.transforms.Rounding
      .apportioned(ft.df, Seq("c0"), 1, ft.canonicalSortKeys(),
        partitionCols = Seq(col("G")))
      .collect().map(r => r.getString(0) -> r.getDouble(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = rows.groupBy(_._1).view.mapValues(g =>
      BigDecimal(g.map(_._3).sum).setScale(1, BigDecimal.RoundingMode.HALF_UP)).toMap
    rounded.foreach { case (g, s) =>
      assert(BigDecimal(s).setScale(1, BigDecimal.RoundingMode.HALF_UP) == expect(g),
        s"group $g")
    }
  }

  test("hierarchical apportionment defaults to the reference's global cumsum; partitioned window is opt-in") {
    // 1 row in group a, 7 in group b, all equal → every pct is 12.5.
    // Global cumsum (reference percentages.py:390-419): column total is the
    // rounded grand total, 100. Partitioned-by-outer-level: group a rounds
    // 12.5→13 and group b 87.5→88, totalling 101 — the documented divergence
    // that keeps the parallel variant opt-in.
    val rows = (("a", "r0", 1.0) +: (0 until 7).map(i => ("b", s"r$i", 1.0))).toSeq
    val ft = FlatTable(rows.toDF("G", "R", "c0"), 2)
    def total(): Double =
      ft.asPercentages(Axis.Rows, ndigits = 0, base = 100, apportioned = Some(true))
        .ordered.collect().map(_.getDouble(2)).sum
    try {
      assert(total() == 100.0) // default: reference parity
      graft.config.FlatbreadConf.updateRuntime("apportion_partitioned" -> "true")
      assert(total() == 101.0) // opt-in: per-group sum preservation
    } finally graft.config.FlatbreadConf.reset()
  }

  test("parameterized aggfunc: quantile margin equals the exact interpolated percentile") {
    val df = Seq(("a", 10.0), ("b", 20.0), ("c", 40.0), ("d", 80.0))
      .toDF("R0", "c0")
    val ft = FlatTable(df, 1).addAgg("quantile:0.5", Axis.Rows, Some("p50"))
    val p50 = ft.ordered.collect().last
    assert(p50.getString(0) == "p50")
    assert(p50.getDouble(1) == 30.0) // (20+40)/2, linear interpolation
    // malformed quantile rejected
    intercept[IllegalArgumentException] {
      graft.funcs.AggFuncs("quantile:1.5")
    }
    assert(graft.funcs.AggFuncs.isKnown("quantile:0.25"))
    assert(!graft.funcs.AggFuncs.isKnown("nope:1"))
  }

  test("apportioned rounding is sum-preserving for random vectors (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 3 + rnd.nextInt(8)
      val vals = Seq.fill(n)(rnd.nextDouble() * 50)
      val df = vals.zipWithIndex.map { case (v, i) => (f"r$i%03d", v) }.toDF("R0", "c0")
      val ft = FlatTable(df, 1)
      val rounded = graft.transforms.Rounding
        .apportioned(ft.df, Seq("c0"), 2, ft.canonicalSortKeys())
        .collect().map(_.getDouble(1))
      val expect = BigDecimal(vals.sum).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(rounded.sum).setScale(2, BigDecimal.RoundingMode.HALF_UP) == expect)
    }
  }
}
