package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.FlatTable

/** Readers for the driver-provided parquet tables (TESTDATA.md). */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long and convert to a microsecond
    * timestamp with integer division (a double division would lose precision
    * above 2^53 ns). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Exact-sum column: doubles cast to DECIMAL(18,2) so distributed
    * aggregation is order-independent (bit-identical across engines and
    * partitionings); cast back to double only at the end of a pipeline. */
  def dec2(c: String) = col(c).cast(DecimalType(18, 2))

  /** Cast every value column of a FlatTable to double (final presentation
    * step after exact decimal aggregation). */
  def castValuesToDouble(ft: FlatTable): FlatTable = {
    val cols = ft.meta.indexLevels.map(col) ++
      ft.meta.valueCols.map(c => col(c).cast("double").as(c))
    FlatTable(ft.df.select(cols: _*), ft.meta)
  }
}
