package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Axis
import graft.sources.IO
import graft.testing.MakeTestDf

/** Source/sink round-trips for every supported format. */
class IOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet/orc/csv/json round-trip a margin table losslessly") {
    val ft = MakeTestDf(spark).addTotals(Axis.Both)
    // compare in plain lexicographic key order on both sides (the re-read
    // table has no margin metadata, so canonical order does not apply)
    val expected = ft.ordered.collect().map(_.toSeq).toSeq
      .sortBy(_.head.asInstanceOf[String])
    for (fmt <- Seq("parquet", "orc", "csv", "json")) {
      val dir = Files.createTempDirectory(s"graft_io_$fmt").toString + "/t"
      IO.writeTable(ft, dir, fmt)
      val back = IO.read(spark, dir, fmt)
        .orderBy("R0").select("R0", "c0", "c1", "c2", "c3", "Totals")
      val rows = back.collect().map(_.toSeq.map {
        // csv/json re-infer integer widths; compare as longs
        case i: Int => i.toLong
        case v => v
      }).toSeq
      assert(rows == expected, s"format $fmt")
    }
  }

  test("partitioned parquet write prunes partitions on read") {
    val df = Tables.read(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_returnflag", "l_quantity")
    val dir = Files.createTempDirectory("graft_io_part").toString + "/t"
    IO.write(df, dir, partitionBy = Seq("l_returnflag"))
    val pruned = IO.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("l_returnflag") === "A")
    // partition pruning: the physical scan must touch only the A directory
    val scanText = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      df.filter(org.apache.spark.sql.functions.col("l_returnflag") === "A").count())
    assert(scanText.contains("PartitionFilters") || pruned.inputFiles.forall(_.contains("l_returnflag=A")))
  }
}
