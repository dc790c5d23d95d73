package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.funcs.AggFuncs

/** Margin aggregates: `addAgg` (one aggregate row/column over the whole table)
  * and `addSubagg` (per-group aggregate rows inserted inside each group).
  * Reference: transforms/aggregation.py:103-209.
  *
  * Spark design (SURVEY.md §2 A1/A2): the aggregate is a lazy
  * `Aggregate` node over the data rows, unioned back under a synthesized
  * margin key; Catalyst plans it as partial+final hash aggregation, so at
  * 100 TB the margin costs one extra (tiny) aggregate over the same scan.
  */
object Aggregation {

  def addAgg(ft: FlatTable, aggfunc: String, axis: Axis = Axis.Rows,
             label: Option[String] = None, ignoreKeys: Seq[String] = Nil,
             fill: String = "", kind: String = "aggs"): FlatTable = {
    val lab = label.getOrElse(aggfunc)
    axis match {
      case Axis.Rows => addAggRow(ft, aggfunc, lab, ignoreKeys, fill, kind)
      case Axis.Cols => addAggCol(ft, aggfunc, lab, ignoreKeys, fill, kind)
      case Axis.Both =>
        // rows first, then columns: the corner cell aggregates the margin row
        // too, so for 'sum' it is the grand total (reference totals.py:58-75,
        // test_totals.py:33-36).
        addAggCol(addAggRow(ft, aggfunc, lab, ignoreKeys, fill, kind),
          aggfunc, lab, ignoreKeys, fill, kind)
    }
  }

  private def addAggRow(ft: FlatTable, aggfunc: String, lab: String,
                        ignoreKeys: Seq[String], fill: String, kind: String): FlatTable = {
    val meta = ft.meta
    requireNoKeyCollision(meta, lab)
    // fork point: base and aggregate both consume the table — read the
    // persisted fork (FlatTable.forked) so the upstream plan runs once
    val src = ft.forked
    val data = src.filter(MarginMask.isData(meta, ignoreKeys))
    val aggExprs = meta.valueCols.map(c => AggFuncs(aggfunc)(col(c)).as(c))
    val aggRow = data.agg(aggExprs.head, aggExprs.tail: _*)
    // margin key: (label, fill, fill, ...) across the index levels
    // (reference aggregation.py:56-70)
    val keyCols = meta.indexLevels.zipWithIndex.map { case (l, i) =>
      (if (i == 0) lit(lab) else lit(fill)).as(l)
    }
    val newRow = aggRow.select(keyCols ++ meta.valueCols.map(col): _*)
    val (base, row) = unifyForUnion(src, newRow, meta)
    FlatTable(base.unionByName(row), meta.withMargin(kind, lab))
  }

  private def addAggCol(ft: FlatTable, aggfunc: String, lab: String,
                        ignoreKeys: Seq[String], fill: String, kind: String): FlatTable = {
    val meta = ft.meta
    require(!meta.valueCols.contains(lab) && !meta.indexLevels.contains(lab),
      s"margin key '$lab' already exists on the column axis")
    val dataCols = meta.dataColumns(ignoreKeys)
    val expr = AggFuncs.rowwise(aggfunc, dataCols.map(c => col(c.physical))).as(lab)
    val key = lab +: Seq.fill(math.max(meta.nColLevels - 1, 0))(fill)
    FlatTable(
      ft.df.withColumn(lab, expr),
      meta.copy(columns = meta.columns :+ ColKey(lab, key)).withMargin(kind, lab)
    )
  }

  def addSubagg(ft: FlatTable, aggfunc: String, level: Level = 0,
                label: Option[String] = None, includeLevelName: Boolean = false,
                ignoreKeys: Seq[String] = Nil, skipSingleRows: Boolean = true,
                fill: String = "", kind: String = "subaggs"): FlatTable = {
    val meta = ft.meta
    require(meta.nLevels > 1, "subaggregates require a hierarchical (multi-level) index")
    val k = meta.resolveLevel(level)
    require(k < meta.nLevels - 1,
      s"cannot subaggregate on the innermost level ($k of ${meta.nLevels})")
    val lab = label.getOrElse(aggfunc match { case "sum" => "Subtotals"; case f => f })
    requireNoKeyCollision(meta, lab)

    val groupCols = meta.indexLevels.take(k + 1)
    val src = ft.forked  // fork point, see addAggRow
    val data = src.filter(MarginMask.isData(meta, ignoreKeys))
    val aggExprs = meta.valueCols.map(c => AggFuncs(aggfunc)(col(c)).as(c)) :+
      count(lit(1)).as("__fb_group_n")
    val grouped = data.groupBy(groupCols.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*)
    // groups with a single data row add no information (reference
    // aggregation.py:191, skip_single_rows default true)
    val kept = if (skipSingleRows) grouped.filter(col("__fb_group_n") > 1) else grouped
    // label, optionally suffixed with the group value (aggregation.py:186-188)
    val labelExpr =
      if (includeLevelName) concat(lit(lab + " "), col(groupCols.last).cast("string"))
      else lit(lab)
    val keyCols =
      groupCols.map(col) ++
        Seq(labelExpr.as(meta.indexLevels(k + 1))) ++
        meta.indexLevels.drop(k + 2).map(l => lit(fill).as(l))
    val newRows = kept.select(keyCols ++ meta.valueCols.map(col): _*)
    val (base, rows) = unifyForUnion(src, newRows, meta)
    FlatTable(base.unionByName(rows), meta.withMargin(kind, lab))
  }

  /** The margin-label key must not collide with one already introduced
    * (reference raises on key collision, aggregation.py:73-79). */
  private def requireNoKeyCollision(meta: TableMeta, lab: String): Unit =
    require(!meta.marginLabelSeq.contains(lab),
      s"margin key '$lab' already present; pass a different label")

  /** Align schemas for the margin union: margin keys force index levels to
    * string (pandas: object dtype on concat); aggregate outputs that widen the
    * value type (avg over long, …) widen both sides to double. Mirrors the
    * dtype-preservation note in SURVEY.md §7.4(5).
    */
  private[transforms] def unifyForUnion(base: DataFrame, margin: DataFrame,
                                        meta: TableMeta): (DataFrame, DataFrame) = {
    val baseTypes = base.schema.fields.map(f => f.name -> f.dataType).toMap
    val marginTypes = margin.schema.fields.map(f => f.name -> f.dataType).toMap

    def target(name: String): Option[DataType] = {
      if (meta.indexLevels.contains(name)) {
        if (baseTypes(name) == StringType) None else Some(StringType)
      } else {
        (baseTypes(name), marginTypes.getOrElse(name, baseTypes(name))) match {
          case (a, b) if a == b                        => None
          case (a: NumericType, b: NumericType)        =>
            def fractional(t: DataType) =
              t == DoubleType || t == FloatType || t.isInstanceOf[DecimalType]
            Some(if (fractional(a) || fractional(b)) DoubleType else LongType)
          case _                                       => Some(StringType)
        }
      }
    }

    def castTo(df: DataFrame): DataFrame = {
      val cols = df.columns.map { c =>
        target(c) match {
          case Some(t) => col(c).cast(t).as(c)
          case None    => col(c)
        }
      }
      df.select(cols.toSeq: _*)
    }
    (castTo(base), castTo(margin))
  }
}
