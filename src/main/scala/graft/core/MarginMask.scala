package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the data-vs-margin row predicate (reference `get_data_mask`,
  * chaining.py:9-49): a row is a margin row if ANY index level value equals a
  * tracked/ignored label OR is string-prefixed by one (so "Totals" also masks
  * "Totals 2024" and include-level-name subtotal labels like "Subtotals X" —
  * observable reference behavior, replicated deliberately).
  */
object MarginMask {

  /** Column expression: true when the row is a margin row. */
  def isMargin(meta: TableMeta, extraIgnore: Seq[String] = Nil): Column = {
    val labels = (meta.marginLabelSeq ++ extraIgnore).distinct
    val tests =
      for (lvl <- meta.indexLevels; lab <- labels)
        yield col(lvl).cast("string").startsWith(lab)
    tests.reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Column expression: true when the row is a plain data row. */
  def isData(meta: TableMeta, extraIgnore: Seq[String] = Nil): Column =
    !isMargin(meta, extraIgnore)

  /** Per-level margin rank: the introduction-order rank of the matching margin
    * label at this level, or -1 for a data value. Drives canonical ordering
    * (margins sort after data within their group, in introduction order —
    * reference keeps physical append order, axes.py:118-125).
    */
  def marginRank(meta: TableMeta, level: String, extraIgnore: Seq[String] = Nil): Column = {
    val labels = (meta.marginLabelSeq ++ extraIgnore).distinct
    labels.zipWithIndex.foldRight(lit(-1): Column) { case ((lab, i), acc) =>
      when(col(level).cast("string").startsWith(lab), lit(i)).otherwise(acc)
    }
  }
}
