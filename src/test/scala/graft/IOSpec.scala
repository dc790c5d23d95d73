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

  test("writeTable→readTable round-trips TableMeta: margins stay tracked, hierarchy survives (VERDICT r2 #3)") {
    import org.apache.spark.sql.functions.col
    // a table with margin rows, a margin column, AND a 2-level column
    // hierarchy (addPercentages adds the {n, pct} outer level)
    val ft = MakeTestDf(spark).addTotals(Axis.Both)
      .addPercentages(Axis.Cols, ndigits = 1)
    val dir = Files.createTempDirectory("graft_io_meta").toString + "/t"
    IO.writeTable(ft, dir)
    val back = IO.readTable(spark, dir)
    // full metadata equality: index levels, column hierarchy, colNames,
    // margin labels in introduction order
    assert(back.meta == ft.meta)
    // margin rows are still recognized: data-row count excludes Totals
    assert(back.dataRows().count() == ft.dataRows().count())
    // a NEW sum margin on the re-read table does NOT double-count: the
    // persisted Totals row is masked out (metadata survived), so the fresh
    // margin equals the original Totals values
    val withCheck = back.addAgg("sum", Axis.Rows, Some("Check"))
    val origTotals = ft.ordered.filter(col("R0") === "Totals")
      .select("c0", "c1", "c2", "c3").head.toSeq
    val checkRow = withCheck.ordered.filter(col("R0") === "Check")
      .select("c0", "c1", "c2", "c3").head.toSeq
    assert(checkRow == origTotals)
  }

  test("bucketed tables join with NO shuffle exchange (co-located join)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.col
    val li = Tables.read(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.read(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
    IO.writeBucketed(li, "li_bkt", Seq("l_orderkey"), buckets = 4,
      sortCols = Seq("l_orderkey"))
    IO.writeBucketed(o, "o_bkt", Seq("o_orderkey"), buckets = 4,
      sortCols = Seq("o_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, "bucketed join must not re-shuffle either side")
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("bucketed overwrite: rerun-safe after catalog loss, self-overwrite rejected with data intact") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(100).toDF("k")
    try {
      // catalog knows nothing but the location exists (the cross-session
      // scenario: in-memory catalog died, warehouse dir survived) — the
      // overwrite must clean the orphan and succeed
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier("ow_bkt")))
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      fs.mkdirs(loc)
      fs.create(new org.apache.hadoop.fs.Path(loc, "stale.bin")).close()
      IO.writeBucketed(df, "ow_bkt", Seq("k"), buckets = 2)
      assert(spark.table("ow_bkt").count() == 100)
      // read-transform-overwrite of the SAME table: Spark's guard must
      // still fire (an unconditional pre-drop would have destroyed the
      // data before the write job discovered the self-read)
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        IO.writeBucketed(spark.table("ow_bkt").filter(col("k") < 10),
          "ow_bkt", Seq("k"), buckets = 2)
      }
      assert(ex.getMessage.toLowerCase.contains("overwrit"), ex.getMessage)
      assert(spark.table("ow_bkt").count() == 100, "data must be intact")
    } finally spark.sql("DROP TABLE IF EXISTS ow_bkt")
  }

  test("salted join and salted aggregation match their unsalted equivalents") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ext.Skew
    // skew: key 0 holds 80% of the probe rows
    val probe = (1 to 1000).map(i => (if (i <= 800) 0L else i.toLong % 7, i.toDouble))
      .toDF("k", "v")
    val build = (0L to 6L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = Skew.saltedJoin(probe, build, Seq("k"), salt = 8)
    val plain = probe.join(build, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).head.getDouble(0) ==
      plain.agg(sum("v")).head.getDouble(0))
    val sAgg = Skew.saltedAgg(probe, Seq("k"),
      Seq(("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")), salt = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val pAgg = probe.groupBy("k")
      .agg(sum("v"), count("v"), min("v"), max("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(sAgg == pAgg)
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

  test("writeShards bounds rows per file and the manifest accounts for every row") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val n = docs.count()
    val dir = Files.createTempDirectory("graft_io_shards").toString + "/s"
    val manifest = IO.writeShards(
      // spread input across tasks so maxRecordsPerFile actually splits
      docs.repartition(2), dir, maxRecordsPerFile = 100).collect()
    assert(manifest.map(_.getAs[Long]("rows")).sum == n)
    assert(manifest.forall(_.getAs[Long]("rows") <= 100L))
    assert(manifest.length >= (n / 100).toInt)
    assert(manifest.forall(_.getAs[Long]("bytes") > 0L))
    assert(manifest.map(_.getAs[String]("file")).distinct.length == manifest.length)
    // round trip: the shards read back to the same id set
    val back = IO.read(spark, dir).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(back == docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException] {
      IO.writeShards(docs, dir, maxRecordsPerFile = 0)
    }
  }

  test("writeShards json format emits loadable JSONL with a line-accurate manifest") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val n = docs.count()
    val dir = Files.createTempDirectory("graft_io_jsonl").toString + "/s"
    val manifest = IO.writeShards(docs.repartition(2), dir,
      maxRecordsPerFile = 100, format = "json").collect()
    assert(manifest.map(_.getAs[Long]("rows")).sum == n)
    assert(manifest.forall(_.getAs[Long]("rows") <= 100L))
    assert(manifest.forall(_.getAs[String]("file").endsWith(".json")))
    // every line is a standalone JSON document (the JSONL contract)
    val back = spark.read.json(dir)
    assert(back.count() == n)
    assert(!back.columns.contains("_corrupt_record"))
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ==
      docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException] {
      IO.writeShards(docs, dir, maxRecordsPerFile = 10, format = "orc")
    }
  }
}
