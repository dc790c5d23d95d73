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

  /** Frequency table of one column (reference Series `value_counts`,
    * accessors/series.py:109-151): nulls are counted under `fillna` unless
    * disabled, a Totals row is appended, and optionally a percentage column.
    * Output order: count descending, value ascending for ties, Totals last
    * (canonical order).
    */
  def valueCounts(df: DataFrame, column: String,
                  fillna: Option[String] = Some(Defaults.naRep),
                  labelN: String = "count", addPct: Boolean = false,
                  labelPct: String = Defaults.labelPct, ndigits: Int = -1,
                  base: Int = 100,
                  labelTotals: String = Defaults.labelTotals): FlatTable = {
    val keyed = fillna match {
      case Some(rep) => df.select(coalesce(col(column).cast("string"), lit(rep)).as(column))
      case None      => df.select(col(column).cast("string").as(column)).na.drop(Seq(column))
    }
    val counts = keyed.groupBy(col(column)).agg(count(lit(1)).as(labelN))
    val ft = FlatTable(counts, TableMeta(Seq(column), Seq(ColKey(labelN, Seq(labelN)))))
    val withTotals = Totals.addTotals(ft, Axis.Rows, labelTotals)
    if (addPct)
      Percentages.addPercentages(withTotals, Axis.Rows, labelN, labelPct,
        ndigits = ndigits, base = base, interleaf = false)
    else withTotals
  }
}
