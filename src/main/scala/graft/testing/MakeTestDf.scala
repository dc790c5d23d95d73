package graft.testing

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.{ColKey, FlatTable, TableMeta}

/** Synthetic fixture generator mirroring the reference's `make_test_df`
  * (testing/dataframe.py:5-162; label scheme per FIXTURES.md §1): non-leaf
  * levels get group labels `"{prefix}_L{level}_G{group}"` repeated by the
  * duplication factor, the leaf level gets `"{prefix.lower}{i}"`, level names
  * default to `"{prefix}{level}"`, and cells are seeded ints in 1..100.
  */
object MakeTestDf {

  def labels(prefix: String, n: Int, dupes: Seq[Int]): Seq[Seq[String]] = {
    val nLevels = dupes.size
    (0 until n).map { i =>
      dupes.zipWithIndex.map { case (d, lvl) =>
        if (lvl == nLevels - 1 && d == 1) s"${prefix.toLowerCase}$i"
        else s"${prefix}_L${lvl}_G${i / d}"
      }
    }
  }

  /** Build the fixture as a FlatTable with hierarchical row and column axes. */
  def apply(spark: SparkSession, nRows: Int = 5, nCols: Int = 4,
            idxDupes: Seq[Int] = Seq(1), colDupes: Seq[Int] = Seq(1),
            seed: Long = 42L): FlatTable = {
    val rowKeys = labels("R", nRows, idxDupes)
    val colKeys = labels("C", nCols, colDupes)
    val rnd = new scala.util.Random(seed)
    val cells = Array.fill(nRows, nCols)(1L + rnd.nextInt(100))

    val idxNames = idxDupes.indices.map(l => s"R$l")
    val physCols = colKeys.map(_.last)
    val schema = StructType(
      idxNames.map(n => StructField(n, StringType, nullable = false)) ++
        physCols.map(c => StructField(c, LongType, nullable = true)))
    val rows = (0 until nRows).map(r =>
      Row.fromSeq(rowKeys(r) ++ cells(r).toSeq))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    FlatTable(df,
      TableMeta(idxNames,
        colKeys.map(k => ColKey(k.last, k)),
        colNames = colDupes.indices.map(l => Option(s"C$l"))))
  }
}
