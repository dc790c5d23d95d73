package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core._
import graft.funcs.AggFuncs

/** Index/column shaping: margin-aware sorting, level insertion, explicit-order
  * sorting, column-axis subtotals, and the date-offset helper.
  * Reference: axes.py:58-368, tooling.py:76-156.
  */
object Shaping {

  /** Margin-aware sort (reference `sort_aggregates`/`sort_totals`,
    * axes.py:58-206): pins the given margin labels after (or before) the data
    * rows *within each group*; data rows sort by value (the deterministic
    * equivalent of the reference's first-appearance order, which has no
    * meaning in Spark's relational model — see FlatTable doc).
    */
  def sortAggregates(ft: FlatTable, axis: Axis = Axis.Rows,
                     labels: Seq[String], aggregatesLast: Boolean = true): FlatTable =
    axis match {
      case Axis.Rows => FlatTable(sortRows(ft, labels, aggregatesLast), ft.meta)
      case Axis.Cols => FlatTable(ft.df, ft.meta.copy(columns =
        sortColumns(ft.meta, labels, aggregatesLast)))
      case Axis.Both =>
        val rowSorted = sortAggregates(ft, Axis.Rows, labels, aggregatesLast)
        sortAggregates(rowSorted, Axis.Cols, labels, aggregatesLast)
    }

  private def sortRows(ft: FlatTable, labels: Seq[String], last: Boolean): DataFrame = {
    if (labels.isEmpty) return ft.df.orderBy(ft.meta.indexLevels.map(col): _*)
    val keys = ft.meta.indexLevels.flatMap { l =>
      val rank = labels.zipWithIndex.foldRight(lit(-1): Column) { case ((lab, i), acc) =>
        when(col(l).cast("string").startsWith(lab), lit(i)).otherwise(acc)
      }
      val flag = when(rank >= 0, lit(if (last) 1 else -1)).otherwise(lit(0))
      Seq(flag, rank, col(l))
    }
    ft.df.orderBy(keys: _*)
  }

  /** Column-axis variant: pure metadata reorder, no shuffle. Stable sort on
    * per-level margin flags only, so non-margin columns keep their appearance
    * order (faithful to axes.py:118-125). */
  private def sortColumns(meta: TableMeta, labels: Seq[String],
                          last: Boolean): Seq[ColKey] = {
    import scala.math.Ordering.Implicits._
    def flag(part: String): Int =
      if (labels.exists(l => part == l || part.startsWith(l))) (if (last) 1 else -1) else 0
    meta.columns.sortBy(ck => ck.key.map(flag).toList)
  }

  /** Insert a constant index/column level (reference `add_level`,
    * axes.py:210-336). Row axis adds a literal column; column axis rewrites
    * the column-key metadata only. */
  def addLevel(ft: FlatTable, value: String, level: Int = 0,
               levelName: Option[String] = None, axis: Axis = Axis.Rows): FlatTable =
    axis match {
      case Axis.Rows =>
        val n = ft.meta.nLevels
        val pos = if (level < 0) level + n + 1 else level
        require(pos >= 0 && pos <= n, s"level $level out of range")
        val name = levelName.getOrElse(s"level_$pos")
        require(!ft.df.columns.contains(name), s"column '$name' already exists")
        val (before, after) = ft.meta.indexLevels.splitAt(pos)
        FlatTable(
          ft.df.withColumn(name, lit(value)),
          ft.meta.copy(indexLevels = (before :+ name) ++ after)
        )
      case Axis.Cols =>
        val n = ft.meta.nColLevels
        val pos = if (level < 0) level + n + 1 else level
        require(pos >= 0 && pos <= n, s"column level $level out of range")
        val cols = ft.meta.columns.map { ck =>
          val (b, a) = ck.key.splitAt(pos)
          ColKey(ck.physical, (b :+ value) ++ a)
        }
        val (nb, na) = ft.meta.colNames.splitAt(pos)
        FlatTable(ft.df, ft.meta.copy(columns = cols, colNames = (nb :+ levelName) ++ na))
      case Axis.Both =>
        addLevel(addLevel(ft, value, level, levelName, Axis.Rows), value, level,
          levelName, Axis.Cols)
    }

  /** Sort rows by an explicit label order on one level (reference
    * `sort_index_from_list`, tooling.py:111-118); labels not in the list sort
    * after, by value. */
  def sortIndexFromList(ft: FlatTable, order: Seq[String], level: Int = 0): FlatTable = {
    val k = ft.meta.resolveLevel(level)
    val lvl = ft.meta.indexLevels(k)
    val pos = array_position(array(order.map(lit): _*), col(lvl).cast("string"))
    val key = when(pos > 0, pos).otherwise(lit(Long.MaxValue))
    val rest = ft.meta.indexLevels.filter(_ != lvl).map(col)
    FlatTable(ft.df.orderBy((Seq(key, col(lvl)) ++ rest): _*), ft.meta)
  }

  /** Column-axis subtotals (reference totals.py axis=1 path): for each group
    * of data columns sharing a key prefix at the given level, append a
    * row-wise sum column placed directly after the group. */
  def addColSubtotals(ft: FlatTable, levels: Seq[Int], label: String,
                      ignoreKeys: Seq[String], fill: String): FlatTable = {
    require(ft.meta.nColLevels > 1,
      "column subtotals require a hierarchical column axis")
    levels.foldLeft(ft)((acc, k) => addColSubtotalLevel(acc, k, label, ignoreKeys, fill))
  }

  private def addColSubtotalLevel(ft: FlatTable, level: Int, label: String,
                                  ignoreKeys: Seq[String], fill: String): FlatTable = {
    val meta = ft.meta
    require(level < meta.nColLevels - 1,
      s"cannot subtotal the innermost column level ($level of ${meta.nColLevels})")
    val dataCols = meta.dataColumns(ignoreKeys).toSet
    // walk columns in order; after the last member of each prefix group,
    // splice in the subtotal column
    val byPrefix = meta.columns.filter(dataCols).groupBy(_.key.take(level + 1))
    val lastOfPrefix: Map[String, Seq[String]] = byPrefix.map { case (p, cks) =>
      cks.last.physical -> p
    }
    var newCols = Vector.empty[ColKey]
    var exprs = Vector.empty[(String, Column)]
    meta.columns.foreach { ck =>
      newCols :+= ck
      lastOfPrefix.get(ck.physical).foreach { prefix =>
        val members = byPrefix(prefix)
        if (members.size > 1) {
          val phys = (prefix :+ label).mkString("__")
          val key = prefix ++ Seq(label) ++
            Seq.fill(meta.nColLevels - prefix.size - 1)(fill)
          newCols :+= ColKey(phys, key)
          exprs :+= phys -> AggFuncs.rowwise("sum", members.map(m => col(m.physical)))
        }
      }
    }
    val df2 = exprs.foldLeft(ft.df) { case (d, (name, e)) => d.withColumn(name, e) }
    FlatTable(df2, meta.copy(columns = newCols).withMargin("subtotals", label))
  }

  /** Shift each year-group's dates so all years align on the latest year's
    * axis (reference `offset_date_field`, tooling.py:76-94). The max year is
    * aggregated once and broadcast — no driver-side collect, scale-safe. */
  def offsetDateField(df: DataFrame, dateField: String, yearField: String): DataFrame = {
    val maxY = df.agg(max(col(yearField)).cast("int").as("__fb_max_year"))
    df.crossJoin(broadcast(maxY))
      .withColumn(dateField,
        add_months(col(dateField),
          (col("__fb_max_year") - col(yearField).cast("int")) * 12))
      .drop("__fb_max_year")
  }
}
