package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Scratch profiler for the q36 SimHash pipeline. Not part of the library
  * surface.
  */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val sigs = Dedup.simhash(docs, "doc_id", "text", hasher = Dedup.Hasher.Md5)
      time("signatures")(sigs.write.format("noop").mode("overwrite").save())
      // block-key distribution: how big do the join buckets get?
      val blocks = (0 until 4).map(b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("v")))
      val keyed = sigs.select(col("id"), col("simhash"), explode(array(blocks: _*)).as("bk"))
      val top = time("bucket histogram")(
        keyed.groupBy("bk").count().orderBy(desc("count")).limit(5).collect())
      top.foreach(r => println(s"  bucket ${r.get(0)} -> ${r.getLong(1)} rows"))
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3,
        hasher = Dedup.Hasher.Md5)
      if (round == 1) {
        val plan = pairs.queryExecution.executedPlan.toString
        println("=== plan (first 120 lines) ===")
        plan.linesIterator.take(120).foreach(l => println("  " + l))
      }
      time("pairs")(pairs.orderBy("id1", "id2").write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
