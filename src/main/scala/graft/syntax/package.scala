package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.core.FlatTable
import graft.pivot.Pivot

/** Accessor-style entry points — the Spark equivalent of the reference's
  * pandas accessor registration (`df.pita.add_totals()`,
  * accessors/dataframe.py:14-17): `import graft.syntax._` puts `.flat(...)`
  * and `.pita(...)` on any DataFrame, returning the FlatTable fluent surface.
  */
package object syntax {

  implicit final class DataFrameOps(private val df: DataFrame) extends AnyVal {

    /** Wrap with the given index level columns; remaining columns are values. */
    def flat(indexLevels: String*): FlatTable = FlatTable(df, indexLevels)

    /** Alias matching the reference accessor name. */
    def pita(indexLevels: String*): FlatTable = flat(indexLevels: _*)

    /** Pivot straight into a FlatTable. */
    def pivotTable(rowKeys: Seq[String], colKey: String, agg: Column,
                   colValues: Seq[String] = Nil): FlatTable =
      Pivot.pivot(df, rowKeys, colKey, agg, colValues)

    /** Frequency table of one column (Series value_counts equivalent). */
    def valueCounts(column: String, addPct: Boolean = false): FlatTable =
      Pivot.valueCounts(df, column, addPct = addPct)
  }
}
