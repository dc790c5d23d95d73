package graft.transforms

import graft.core._

/** Sum margins: grand totals, per-level subtotals, and their removal.
  * Reference: transforms/totals.py:36-262. `addTotals`/`addSubtotals` are
  * thin specializations of [[Aggregation]] with `aggfunc='sum'`; previously
  * introduced margin labels are auto-ignored through the tracked-label mask,
  * so totals∘subtotals commutes with subtotals∘totals
  * (reference test_totals.py:153-164).
  */
object Totals {

  def addTotals(ft: FlatTable, axis: Axis = Axis.Both,
                label: String = Defaults.labelTotals,
                ignoreKeys: Seq[String] = Nil, fill: String = ""): FlatTable =
    Aggregation.addAgg(ft, "sum", axis, Some(label), ignoreKeys, fill, kind = "totals")

  def addSubtotals(ft: FlatTable, axis: Axis = Axis.Rows, levels: Seq[Level] = Seq(0),
                   label: String = Defaults.labelSubtotals,
                   includeLevelName: Boolean = false, ignoreKeys: Seq[String] = Nil,
                   skipSingleRows: Boolean = true, fill: String = ""): FlatTable = {
    axis match {
      case Axis.Rows =>
        // one pass per level in the given order (reference totals.py:238-251);
        // each pass sees the previous pass's labels and auto-ignores them.
        // Labels must stay distinct across passes (margin-key collision rule),
        // so subsequent levels get a level-qualified label.
        levels.zipWithIndex.foldLeft(ft) { case (acc, (lvl, i)) =>
          val k = acc.meta.resolveLevel(lvl)
          val lab = if (i == 0) label else s"$label (${acc.meta.indexLevels(k)})"
          Aggregation.addSubagg(acc, "sum", lvl, Some(lab), includeLevelName,
            ignoreKeys, skipSingleRows, fill, kind = "subtotals")
        }
      case Axis.Cols =>
        Shaping.addColSubtotals(ft, levels.map(ft.meta.resolveLevel), label, ignoreKeys, fill)
      case Axis.Both =>
        addSubtotals(addSubtotals(ft, Axis.Rows, levels, label, includeLevelName,
            ignoreKeys, skipSingleRows, fill),
          Axis.Cols, levels, label, includeLevelName, ignoreKeys, skipSingleRows, fill)
    }
  }

  /** Remove all margin rows (reference totals.py:255-262). Margin *columns*
    * are kept, as in the reference (the mask is row-axis only). Row margin
    * labels are cleared from the metadata so downstream ops do not mask
    * phantom labels. */
  def dropTotals(ft: FlatTable, ignoreKeys: Seq[String] = Nil): FlatTable = {
    val kept = ft.df.filter(MarginMask.isData(ft.meta, ignoreKeys))
    val colLabels = ft.meta.columns.flatMap(_.key).toSet
    val remaining = ft.meta.marginLabels.filter(m => colLabels.exists(_.startsWith(m.label)))
    FlatTable(kept, ft.meta.copy(marginLabels = remaining))
  }
}
