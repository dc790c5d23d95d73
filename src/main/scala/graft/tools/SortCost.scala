package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextStats

/** Scratch probe: fixed-overhead share of the trailing cosmetic
  * `.orderBy` in sub-second bench queries (round-15 headroom work).
  * Times q30's body with and without the final global sort. */
object SortCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def body() = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"),
        TextStats.rollingHash(col("text")).as("rolling_hash"))
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        System.gc(); val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-12s median=${ts.sorted.apply(2)}%.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // warmup
    body().write.format("noop").mode("overwrite").save()
    body().orderBy(col("doc_id")).write.format("noop").mode("overwrite").save()
    time("plain")(body().write.format("noop").mode("overwrite").save())
    time("sorted")(body().orderBy(col("doc_id")).write.format("noop").mode("overwrite").save())
    time("plain2")(body().write.format("noop").mode("overwrite").save())
    time("sorted2")(body().orderBy(col("doc_id")).write.format("noop").mode("overwrite").save())
    body().repartition(1).sortWithinPartitions(col("doc_id")).write.format("noop").mode("overwrite").save()
    time("rep1sort")(body().repartition(1).sortWithinPartitions(col("doc_id")).write.format("noop").mode("overwrite").save())
    body().coalesce(1).sortWithinPartitions(col("doc_id")).write.format("noop").mode("overwrite").save()
    time("coal1sort")(body().coalesce(1).sortWithinPartitions(col("doc_id")).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
