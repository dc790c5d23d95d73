package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.FlatTable

/** Sources and sinks (SURVEY.md §2.6: the reference has none — input tables
  * arrive via user code; Spark's readers/writers are exposed here as the
  * engine's IO surface). Parquet is the primary format (columnar, predicate
  * pushdown, column pruning); csv/json/orc round-trip for interchange.
  */
object IO {

  val Formats: Set[String] = Set("parquet", "orc", "csv", "json")

  def read(spark: SparkSession, path: String, format: String = "parquet",
           options: Map[String, String] = Map.empty): DataFrame = {
    require(Formats(format), s"unsupported format '$format'")
    val base = spark.read.options(options)
    format match {
      // csv/json re-infer types; header on by default for csv
      case "csv"  => base.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" => base.json(path)
      case "orc"  => base.orc(path)
      case _      => base.parquet(path)
    }
  }

  def write(df: DataFrame, path: String, format: String = "parquet",
            mode: SaveMode = SaveMode.Overwrite,
            partitionBy: Seq[String] = Nil,
            options: Map[String, String] = Map.empty): Unit = {
    require(Formats(format), s"unsupported format '$format'")
    val w0 = df.write.mode(mode).options(options)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    format match {
      case "csv"  => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case "orc"  => w.orc(path)
      case _      => w.parquet(path)
    }
  }

  /** Write a FlatTable's canonical view (margins in place, metadata order). */
  def writeTable(ft: FlatTable, path: String, format: String = "parquet"): Unit =
    write(ft.ordered, path, format)

  /** Bucketed (and optionally sort-ordered) table write: pre-shuffles rows
    * into a fixed number of buckets on the join/aggregation key so that
    * later equi-joins and groupBys on that key are EXCHANGE-FREE — both
    * sides read already co-partitioned (and co-sorted) buckets. This is the
    * 100 TB answer to a repeatedly-joined fact table: pay the shuffle once
    * at write time, never again at read time. Bucket metadata lives in the
    * session catalog, hence `saveAsTable` rather than a path write. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil,
                    format: String = "parquet",
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketed write needs at least one bucket column")
    val w = df.write.mode(mode).format(format)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val ws =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }
}
