package graft.pivot

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core._
import graft.transforms.{Percentages, Totals}

/** The producer layer: turns arbitrarily large input relations into the small
  * labeled pivot tables the tabulation operators work on (SURVEY.md §1.3
  * "load-bearing design fact"). This is where 100 TB scale lives — a
  * `groupBy().pivot().agg()` plans to one shuffle with partial (map-side)
  * aggregation; margins can then be layered on the result without rescanning
  * the input.
  */
object Pivot {

  /** Pivot `df` into a FlatTable: `rowKeys` become index levels, the distinct
    * values of `colKey` become value columns, cells hold `agg`.
    * @param colValues pass the expected pivot values when known — avoids the
    *                  extra distinct-values job Spark otherwise runs, which
    *                  matters on wide inputs.
    */
  def pivot(df: DataFrame, rowKeys: Seq[String], colKey: String, agg: Column,
            colValues: Seq[String] = Nil): FlatTable = {
    val grouped = df.groupBy(rowKeys.map(col): _*)
    val pivoted =
      if (colValues.nonEmpty) grouped.pivot(colKey, colValues).agg(agg)
      else grouped.pivot(colKey).agg(agg)
    val valueCols = pivoted.columns.toSeq.filterNot(rowKeys.contains)
    FlatTable(pivoted,
      TableMeta(rowKeys, valueCols.map(c => ColKey(c, Seq(c))),
        colNames = Seq(Some(colKey))))
  }

  /** Plain grouped aggregation (no column pivot): index levels = group keys,
    * one value column per aggregate. */
  def groupAgg(df: DataFrame, rowKeys: Seq[String], aggs: Column*): FlatTable = {
    val out = df.groupBy(rowKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val valueCols = out.columns.toSeq.filterNot(rowKeys.contains)
    FlatTable(out, TableMeta(rowKeys, valueCols.map(c => ColKey(c, Seq(c)))))
  }

  // ---- margins-at-scan (the 100 TB path) -------------------------------
  //
  // The layered operators (addTotals/addSubtotals) union an extra aggregate
  // over the data rows — semantically exact, but the physical plan re-scans
  // the input once per margin (visible in `graft.Plans`). When the input is
  // the raw fact table, margins should instead ride the SAME scan+shuffle as
  // the pivot: ROLLUP gives every prefix grouping set in one pass, and the
  // margin keys are synthesized from `grouping()` flags (SURVEY.md §7 M5).

  /** Index of the first grouped-out level (rollup sets are prefixes) —
    * must be evaluated inside the rollup aggregate, where grouping() is
    * defined. */
  private def firstGroupedLevel(rowKeys: Seq[String]): Column = {
    val n = rowKeys.size
    rowKeys.zipWithIndex.reverse
      .foldLeft(lit(n): Column) { case (acc, (key, i)) =>
        when(grouping(col(key)) === 1, lit(i)).otherwise(acc)
      }
  }

  /** Margin-key synthesis from the materialized first-grouped-level column:
    * levels before it keep their value, the level itself gets the margin
    * label (totals at level 0, subtotals deeper), the rest are filled. */
  private def marginKeyCols(rowKeys: Seq[String], kCol: Column,
                            totalsLabel: String, subtotalsLabel: String,
                            fill: String): Seq[Column] =
    rowKeys.zipWithIndex.map { case (key, i) =>
      when(lit(i) < kCol, col(key).cast("string"))
        .when(lit(i) === kCol, lit(if (i == 0) totalsLabel else subtotalsLabel))
        .otherwise(lit(fill))
        .as(key)
    }

  /** Pivot + totals (and, for a multi-level row key, subtotals) computed in a
    * single scan and a single shuffle: ROLLUP over the row keys with
    * conditional aggregation per pivot value; the grand-total row is the empty
    * grouping set, never a second pass over the input.
    */
  def pivotWithMargins(df: DataFrame, rowKeys: Seq[String], colKey: String,
                       cellExpr: Column, colValues: Seq[String],
                       aggName: String = "sum",
                       totalsLabel: String = Defaults.labelTotals,
                       subtotalsLabel: String = Defaults.labelSubtotals,
                       fill: String = "",
                       addTotalsColumn: Boolean = true,
                       skipSingleRows: Boolean = true): FlatTable = {
    val aggFn = graft.funcs.AggFuncs(aggName)
    val cells = colValues.map(v => aggFn(when(col(colKey) === v, cellExpr)).as(v))
    fuseMargins(df, rowKeys, cells, colValues, totalsLabel, subtotalsLabel,
      fill, addTotalsColumn, skipSingleRows, Seq(Some(colKey)))
  }

  /** Plain grouped aggregation with fused margins (non-pivot variant):
    * produces exactly what `groupAgg(...).addSubtotals(...).addTotals(Rows)`
    * produces, in one pass. */
  def groupAggWithMargins(df: DataFrame, rowKeys: Seq[String], aggs: Seq[Column],
                          totalsLabel: String = Defaults.labelTotals,
                          subtotalsLabel: String = Defaults.labelSubtotals,
                          fill: String = "",
                          skipSingleRows: Boolean = true): FlatTable = {
    val valueNames = {
      // alias-carrying columns: recover output names from a dry projection
      val probe = df.limit(0).groupBy(rowKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      probe.columns.toSeq.filterNot(rowKeys.contains)
    }
    fuseMargins(df, rowKeys, aggs, valueNames, totalsLabel, subtotalsLabel,
      fill, addTotalsColumn = false, skipSingleRows, Seq(None))
  }

  private def fuseMargins(df: DataFrame, rowKeys: Seq[String], cells: Seq[Column],
                          valueNames: Seq[String], totalsLabel: String,
                          subtotalsLabel: String, fill: String,
                          addTotalsColumn: Boolean, skipSingleRows: Boolean,
                          colNames: Seq[Option[String]]): FlatTable = {
    val n = rowKeys.size
    val keyCols = marginKeyCols(rowKeys, col("__fb_k"), totalsLabel,
      subtotalsLabel, fill)
    // child-group count for skip_single_rows semantics: a subtotal over a
    // group with a single child adds no information (aggregation.py:191)
    val nChild = count_distinct(col(rowKeys.last)).as("__fb_nchild")
    val agged = df.rollup(rowKeys.map(col): _*)
      .agg(cells.head,
        (cells.tail ++ Seq(nChild) :+ firstGroupedLevel(rowKeys).as("__fb_k")): _*)
    val kept =
      if (skipSingleRows && n > 1)
        agged.filter(!(col("__fb_k") > 0 && col("__fb_k") < n && col("__fb_nchild") <= 1))
      else agged
    val out = kept.select(keyCols ++ valueNames.map(col): _*)
    val meta0 = TableMeta(rowKeys, valueNames.map(c => ColKey(c, Seq(c))), colNames)
    val meta =
      (if (n > 1) meta0.withMargin("subtotals", subtotalsLabel) else meta0)
        .withMargin("totals", totalsLabel)
    val ft = FlatTable(out, meta)
    if (addTotalsColumn)
      graft.transforms.Aggregation.addAgg(ft, "sum", Axis.Cols, Some(totalsLabel),
        kind = "totals")
    else ft
  }

  /** Frequency table of one column (reference Series `value_counts`,
    * accessors/series.py:109-151): nulls are counted under `fillna` unless
    * disabled, a Totals row is appended, and optionally a percentage column.
    * Output order follows pandas `value_counts(sort=True)` — count
    * descending, value ascending for ties, Totals pinned last (carried as
    * [[TableMeta.rowOrder]] so `.ordered` emits it); `sort = false` falls
    * back to canonical value order.
    */
  def valueCounts(df: DataFrame, column: String,
                  fillna: Option[String] = Some(Defaults.naRep),
                  labelN: String = "count", addPct: Boolean = false,
                  labelPct: String = Defaults.labelPct, ndigits: Int = -1,
                  base: Int = Defaults.base,
                  labelTotals: String = Defaults.labelTotals,
                  sort: Boolean = true): FlatTable = {
    val keyed = fillna match {
      case Some(rep) => df.select(coalesce(col(column).cast("string"), lit(rep)).as(column))
      case None      => df.select(col(column).cast("string").as(column)).na.drop(Seq(column))
    }
    val counts = keyed.groupBy(col(column)).agg(count(lit(1)).as(labelN))
    val order = if (sort) Seq(SortKey(labelN, ascending = false)) else Nil
    val ft = FlatTable(counts,
      TableMeta(Seq(column), Seq(ColKey(labelN, Seq(labelN))), rowOrder = order))
    val withTotals = Totals.addTotals(ft, Axis.Rows, labelTotals)
    if (addPct)
      Percentages.addPercentages(withTotals, Axis.Rows, labelN, labelPct,
        ndigits = ndigits, base = base, interleaf = false)
    else withTotals
  }
}
