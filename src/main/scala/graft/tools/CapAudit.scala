package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off LSH band-bucket-cap audit over a documents table — the runbook
  * command behind COVERAGE.md's "did the cap change my corpus?" paragraph.
  * Prints the [[graft.ext.Dedup.BucketCapReport]] for the default cap:
  * `droppedRows` must be 0 for the cap to be pure insurance at this scale;
  * `maxBucket` is the headroom number to watch as the corpus grows.
  *
  * Usage: `runMain graft.tools.CapAudit [sfDir] [cap]`
  * (defaults: /root/testdata/sf0.1, Dedup.DefaultMaxBandBucket).
  * Measured 2026-08: sf0.1 → BucketCapReport(0, 4, Some(10000)).
  */
object CapAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.lift(1).map(_.toInt)
      .getOrElse(graft.ext.Dedup.DefaultMaxBandBucket)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).appName("capaudit").getOrCreate()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sigs = graft.ext.Dedup.minhashSignatures(docs, "doc_id", "text")
    val rep = graft.ext.Dedup.bucketCapReport(sigs, cap = Some(cap))
    println(s"CAPAUDIT $rep")
    spark.stop()
  }
}
