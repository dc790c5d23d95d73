package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core._

/** Percentage views (reference transforms/percentages.py:109-386) and
  * sum-preserving apportioned rounding (percentages.py:390-419).
  *
  * Axis semantics follow the reference *implementation and tests*, not its
  * contradictory docstrings (SURVEY.md §2 A7): axis=0 divides by the
  * column-totals ROW (each column sums to base), axis=1 divides by the
  * row-totals COLUMN, axis=2 divides by the grand-total corner cell.
  *
  * Scale design: the totals row / grand-total cell denominator is an
  * unpartitioned window over the pivoted table — never a driver collect, and
  * never a second execution of the producing scan+pivot subplan (a filtered
  * cross-join branch would re-run it; Spark does not reuse the exchange
  * across those branches). Percentage views apply to pivot OUTPUTS, which
  * are presentation-sized by the engine's two-layer contract (SURVEY.md
  * §1.3), so the single-partition window is bounded; the row-totals column
  * is a plain projection.
  */
object Percentages {

  private val TOT = "__fb_tot_"

  def asPercentages(ft: FlatTable, axis: Axis = Axis.Both,
                    labelTotals: Option[String] = None, ignoreKeys: Seq[String] = Nil,
                    ndigits: Int = -1, base: Int = Defaults.base,
                    apportioned: Option[Boolean] = None): FlatTable = {
    val plan = planPcts(ft, axis, labelTotals, ignoreKeys, base)
    val replaced = plan.df.select(
      (ft.meta.indexLevels.map(col) ++ ft.meta.columns.map { ck =>
        plan.exprFor.getOrElse(ck.physical, col(ck.physical)).as(ck.physical)
      }): _*
    )
    // record the base the values were computed with so presentation sinks
    // format to the DATA's scale, not a global config guess (TableMeta doc)
    val rounded = applyRounding(FlatTable(replaced, ft.meta.copy(pctBase = Some(base))),
      plan.eligible.map(_.physical),
      ndigits, useApportioned(ft, labelTotals, apportioned))
    rounded
  }

  def addPercentages(ft: FlatTable, axis: Axis = Axis.Both,
                     labelN: String = Defaults.labelN, labelPct: String = Defaults.labelPct,
                     labelTotals: Option[String] = None, ignoreKeys: Seq[String] = Nil,
                     ndigits: Int = -1, base: Int = Defaults.base, interleaf: Boolean = false,
                     apportioned: Option[Boolean] = None): FlatTable = {
    val meta = ft.meta
    val plan = planPcts(ft, axis, labelTotals, ignoreKeys, base)
    val hadPct = meta.columns.exists(ck => isPctCol(meta, ck))
    def pctPhys(c: String) = s"${labelPct}__$c"

    val (newCols: Seq[ColKey], physOrder: Seq[(String, Column)]) =
      if (!hadPct) {
        // first percentage block: a new outer column level {n, pct}
        // (reference percentages.py:369-371); interleaf moves it innermost and
        // interleaves physical order (percentages.py:378-386)
        val nCols = meta.columns.map(ck =>
          ColKey(ck.physical, if (interleaf) ck.key :+ labelN else labelN +: ck.key))
        val pCols = plan.eligible.map(ck =>
          ColKey(pctPhys(ck.physical),
            if (interleaf) ck.key :+ labelPct else labelPct +: ck.key))
        val cols =
          if (interleaf)
            meta.columns.flatMap { ck =>
              val n = ColKey(ck.physical, ck.key :+ labelN)
              pCols.find(_.physical == pctPhys(ck.physical)) match {
                case Some(p) => Seq(n, p)
                case None    => Seq(n)
              }
            }
          else nCols ++ pCols
        val order = cols.map { ck =>
          if (ck.physical.startsWith(labelPct + "__")) {
            val src = ck.physical.stripPrefix(labelPct + "__")
            ck.physical -> plan.exprFor(src)
          } else ck.physical -> col(ck.physical)
        }
        (cols, order)
      } else {
        // pct columns already exist: append without adding a level
        // (reference percentages.py:372-377)
        val pCols = plan.eligible.map { ck =>
          val key =
            if (ck.key.size > 1) labelPct +: ck.key.tail else labelPct +: ck.key
          ColKey(pctPhys(ck.physical), key)
        }
        val order = meta.columns.map(ck => ck.physical -> col(ck.physical)) ++
          plan.eligible.map(ck => pctPhys(ck.physical) -> plan.exprFor(ck.physical))
        (meta.columns ++ pCols, order)
      }

    val projected = plan.df.select(
      (meta.indexLevels.map(col) ++ physOrder.map { case (n, e) => e.as(n) }): _*
    )
    val newColNames: Seq[Option[String]] =
      if (hadPct) meta.colNames
      else if (interleaf) meta.colNames :+ None
      else None +: meta.colNames
    val newMeta = meta.copy(columns = newCols, colNames = newColNames,
        pctBase = Some(base))
      .withMargin("percentages", labelPct)
    applyRounding(FlatTable(projected, newMeta),
      plan.eligible.map(ck => pctPhys(ck.physical)), ndigits,
      useApportioned(ft, labelTotals, apportioned))
  }

  // ---- planning ---------------------------------------------------------

  private case class PctPlan(df: DataFrame, exprFor: Map[String, Column], eligible: Seq[ColKey])

  private def isPctCol(meta: TableMeta, ck: ColKey): Boolean = {
    val pctLabels = (meta.labelsOf("percentages") :+ Defaults.labelPct).distinct
    ck.key.exists(part => pctLabels.exists(l => part == l || part.startsWith(l)))
  }

  /** Columns eligible for a percentage view: everything except existing pct
    * columns (reference mask, percentages.py:211-215 — note margin/Totals
    * columns ARE included: their pct is base). */
  private def eligibleCols(meta: TableMeta): Seq[ColKey] =
    meta.columns.filterNot(ck => isPctCol(meta, ck))

  private def planPcts(ft: FlatTable, axis: Axis, labelTotals: Option[String],
                       ignoreKeys: Seq[String], base: Int): PctPlan = {
    val meta = ft.meta
    val eligible = eligibleCols(meta)
    val totalLabels =
      (labelTotals.toSeq ++ meta.labelsOf("totals") ++ ignoreKeys).distinct

    def totalsColumn: Option[ColKey] =
      eligible.reverse.find(ck =>
        ck.key.exists(part => totalLabels.exists(l => part == l || part.startsWith(l))))

    def totalsRowPredicate: Option[Column] =
      if (totalLabels.isEmpty) None
      else Some(meta.indexLevels.map(l =>
        totalLabels.map(lab => col(l).cast("string").startsWith(lab)).reduce(_ || _)
      ).reduce(_ || _))

    axis match {
      case Axis.Cols =>
        // divide by the row-totals column; fall back to an on-the-fly
        // row-wise sum when no totals column exists
        val denom: Column = totalsColumn match {
          case Some(tc) => col(tc.physical)
          case None     => graft.funcs.AggFuncs.rowwise("sum",
            eligible.map(c => col(c.physical)))
        }
        val exprs = eligible.map(ck =>
          ck.physical -> (col(ck.physical).cast("double") / denom * base)).toMap
        PctPlan(ft.df, exprs, eligible)

      case Axis.Rows =>
        // divide by the column-totals row, located via an unpartitioned
        // window over the (presentation-sized, by contract) pivot output.
        // A filtered-branch cross join would re-execute the entire producing
        // scan+pivot subplan for the denominator (Spark does not reuse the
        // exchange across the differently-shaped branches); the window reads
        // the produced table once — the plan that stays single-pass when the
        // producer is a 100 TB scan.
        val w = Window.partitionBy()
        def denom(c: String): Column = totalsRowPredicate match {
          case Some(p) => max(when(p, col(c))).over(w)
          case None    =>
            sum(when(MarginMask.isData(meta, ignoreKeys), col(c))).over(w)
        }
        val exprs = eligible.map(ck =>
          ck.physical ->
            (col(ck.physical).cast("double") / denom(ck.physical) * base)).toMap
        PctPlan(ft.df, exprs, eligible)

      case Axis.Both =>
        // divide by the grand-total corner cell (same single-pass window)
        val w = Window.partitionBy()
        val grand: Column = (totalsRowPredicate, totalsColumn) match {
          case (Some(p), Some(tc)) => max(when(p, col(tc.physical))).over(w)
          case _ =>
            val dataCols = meta.dataColumns(ignoreKeys)
            sum(when(MarginMask.isData(meta, ignoreKeys),
              dataCols.map(ck => coalesce(col(ck.physical).cast("double"),
                lit(0.0))).reduce(_ + _))).over(w)
        }
        val exprs = eligible.map(ck =>
          ck.physical ->
            (col(ck.physical).cast("double") / grand * base)).toMap
        PctPlan(ft.df, exprs, eligible)
    }
  }

  // ---- rounding ---------------------------------------------------------

  /** Plan-time apportionment decision. The reference decides by checking at
    * runtime whether values sum to their totals within 1e-10
    * (percentages.py:93-105). Here the decision is structural and
    * deterministic: totals produced by this engine's own `addTotals` are exact
    * sums, so apportioned rounding applies; externally supplied totals
    * (labelTotals) fall back to plain rounding unless forced.
    */
  private def useApportioned(ft: FlatTable, labelTotals: Option[String],
                             forced: Option[Boolean]): Boolean =
    forced.getOrElse(labelTotals.isEmpty)

  private def applyRounding(ft: FlatTable, cols: Seq[String], ndigits: Int,
                            apportioned: Boolean): FlatTable =
    if (ndigits < 0) ft
    else if (apportioned)
      FlatTable(Rounding.apportioned(ft.df, cols, ndigits, ft.canonicalSortKeys(),
        // scale option (opt-in via `apportion_partitioned`): on a
        // hierarchical index, apportion within each outer-level group
        // (bounded partitions) instead of one global single-partition
        // window. Each group's rounded values then sum to that group's
        // rounded sum — which can differ from the reference's global
        // column-wise cumsum when per-group rounded sums don't add up to
        // the rounded grand total, so reference parity (global) is the
        // default.
        partitionCols =
          if (Defaults.conf.apportionPartitioned)
            ft.meta.indexLevels.dropRight(1).map(col)
          else Nil), ft.meta)
    else {
      val rounded = cols.foldLeft(ft.df)((d, c) => d.withColumn(c, round(col(c), ndigits)))
      FlatTable(rounded, ft.meta)
    }
}

/** Sum-preserving (largest-remainder-style) rounding: each value becomes the
  * difference of consecutive rounded cumulative sums, so the rounded values
  * sum exactly to the rounded total (reference `round_apportioned`,
  * percentages.py:390-419; 3×33.33% → 100.0 exactly). Runs column-wise down
  * the canonical row order, matching the reference quirk that apportionment
  * is always down columns regardless of the percentage axis.
  */
object Rounding {

  /** @param partitionCols when non-empty, the cumulative sums run per
    *   partition (each group's rounded values sum exactly to that group's
    *   rounded sum) and the window shuffles by key instead of collapsing to
    *   one partition — the formulation that stays parallel at scale. With no
    *   partition columns the window is global: correct for the
    *   presentation-sized single-level pivots it is meant for, and exactly
    *   the reference's column-wise cumsum. */
  def apportioned(df: DataFrame, cols: Seq[String], ndigits: Int,
                  orderKeys: Seq[Column],
                  partitionCols: Seq[Column] = Nil): DataFrame = {
    if (ndigits < 0 || cols.isEmpty) return df
    val w =
      if (partitionCols.isEmpty) Window.orderBy(orderKeys: _*)
      else Window.partitionBy(partitionCols: _*).orderBy(orderKeys: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(null).cast("double")).otherwise(
          round(sum(col(c)).over(cum), ndigits) -
            coalesce(round(sum(col(c)).over(prev), ndigits), lit(0.0))))
    }
  }
}
