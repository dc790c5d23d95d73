package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

import graft.core.{FlatTable, TableMetaCodec}

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

  /** Training-shard export: write the corpus as size-bounded parquet
    * shards (`spark.sql.files.maxRecordsPerFile` per task output) with an
    * optional epoch-shuffle layout column set, and return the MANIFEST —
    * one row per written file with its row count and byte size — that a
    * training loader consumes to plan workers without listing storage.
    *
    * The row counts come from ONE metadata-only pass over the written
    * files (parquet footers; Spark plans a count over file statistics, no
    * data pages are read) joined with the FileSystem listing for sizes —
    * both manifest-sized, collected nowhere. Returns (file, rows, bytes)
    * sorted by file name; pair with [[graft.ext.Audit.epochShuffle]]
    * upstream so shard order IS training order.
    *
    * `format = "json"` writes JSONL shards instead — the format HF
    * datasets / Megatron-style preprocessors ingest directly. JSONL has no
    * footer statistics, so its manifest row counts come from one pass over
    * the written LINES (`spark.read.text` + input_file_name — linear in
    * the data, still collected nowhere); parquet stays footer-only. */
  def writeShards(df: DataFrame, path: String, maxRecordsPerFile: Long,
                  partitionBy: Seq[String] = Nil,
                  format: String = "parquet"): DataFrame = {
    require(maxRecordsPerFile >= 1,
      s"maxRecordsPerFile must be >= 1, got $maxRecordsPerFile")
    require(format == "parquet" || format == "json",
      s"format must be parquet or json, got $format")
    val w0 = df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    val ext = format match { case "json" => ".json"; case _ => ".parquet" }
    format match { case "json" => w.json(path); case _ => w.parquet(path) }
    val spark = df.sparkSession
    import org.apache.spark.sql.functions._
    // join on the BASENAME (unique per file: part-NNNN-<uuid>): the
    // scan-side input_file_name() and the listing-side Path render the
    // same file with different URI spellings (file:/// vs file:/)
    val readBack =
      if (format == "json")
        spark.read.option("recursiveFileLookup", "true").text(path)
      else spark.read.parquet(path)
    val rows = readBack
      .select(element_at(split(input_file_name(), "/"), -1).as("file"))
      .groupBy(col("file")).agg(count(lit(1)).as("rows"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    val sizes = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(ext))
        sizes += ((f.getPath.getName, f.getLen))
    }
    import spark.implicits._
    rows.join(sizes.toSeq.toDF("file", "bytes"), Seq("file"))
      .select(col("file"), col("rows"), col("bytes"))
      .orderBy(col("file"))
  }

  /** Write a FlatTable's canonical view (margins in place, metadata order),
    * with the full [[graft.core.TableMeta]] serialized into the first
    * column's `StructField.metadata` so [[readTable]] can rebuild the
    * FlatTable — margin tracking, column hierarchy, row order and all
    * (SURVEY §1.3). Parquet and ORC persist field metadata; csv/json do not
    * (a csv/json write degrades to the plain canonical view). */
  def writeTable(ft: FlatTable, path: String, format: String = "parquet"): Unit = {
    val ordered = ft.ordered
    val md = new MetadataBuilder()
      .putString(TableMetaCodec.Key, TableMetaCodec.toJson(ft.meta)).build()
    val first = ordered.columns.head
    write(ordered.withColumn(first, col(first).as(first, md)), path, format)
  }

  /** Rebuild a FlatTable written by [[writeTable]]: reads the table and
    * deserializes the TableMeta from the schema's field metadata, so the
    * round-tripped table ISN'T a plain DataFrame — `addTotals` still skips
    * the persisted margin rows, the column hierarchy survives, and
    * `.ordered` still honors the explicit row order. */
  def readTable(spark: SparkSession, path: String,
                format: String = "parquet"): FlatTable = {
    val df = read(spark, path, format)
    val json = df.schema.fields.collectFirst {
      case f if f.metadata.contains(TableMetaCodec.Key) =>
        f.metadata.getString(TableMetaCodec.Key)
    }.getOrElse(throw new IllegalArgumentException(
      s"no '${TableMetaCodec.Key}' metadata at $path — not written by IO.writeTable " +
        "(or a format that drops field metadata, e.g. csv/json)"))
    FlatTable(df, TableMetaCodec.fromJson(json))
  }

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
    if (mode == SaveMode.Overwrite) dropOrphanedLocation(df.sparkSession, table)
    val w = df.write.mode(mode).format(format)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val ws =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Delete `table`'s default warehouse location — ONLY when the catalog
    * does not know the table. With an in-memory metastore (the default
    * outside a configured Hive catalog) the catalog dies with the session
    * while the managed table's directory survives, and the next overwrite
    * into the same name fails with LOCATION_ALREADY_EXISTS. When the
    * catalog DOES know the table this is deliberately a no-op: a plain
    * `saveAsTable(Overwrite)` already replaces it correctly, and — unlike
    * an unconditional pre-drop — Spark's "cannot overwrite a table that is
    * also being read from" guard stays in force (a pre-drop would destroy
    * the data BEFORE the write job discovers it reads from the target).
    * Handles database-qualified names via the session parser. */
  def dropOrphanedLocation(spark: SparkSession, table: String): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (!spark.sessionState.catalog.tableExists(ident)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
      ()
    }
  }
}
