package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextStats}

/** Scratch profiler for the q35 MinHash pipeline (VERDICT r2 next-round #1).
  * Times each stage in isolation with a noop sink. Not part of the library
  * surface; deleted or kept as a dev tool.
  */
object ProfileMinhash {
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
    docs.count() // warm the scan

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      // stage 1: postings (tokenize + shingle + explode + distinct)
      val post = docs
        .select(col("doc_id").as("id"), TextStats.tokens(col("text")).as("__t"))
        .select(col("id"), explode(Dedup.shinglesOfTokens(col("__t"), 4)).as("g"))
        .distinct()
      time("postings.count")(println("  rows=" + post.count()))

      // stage 2: signatures on top (cached postings not used — full recompute,
      // as in the real pipeline)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      time("signatures")(sigs.write.format("noop").mode("overwrite").save())

      // stage 3: candidates (recomputes signatures)
      val cands = Dedup.lshCandidates(Dedup.minhashSignatures(docs, "doc_id", "text"))
      time("candidates")(cands.write.format("noop").mode("overwrite").save())

      // stage 4: full pipeline
      val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text", minJaccard = 0.8)
      time("full")(pairs.orderBy("id1", "id2").write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
