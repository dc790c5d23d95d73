package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated substring filter for local iteration
    // (driver never sets it → full suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.contains))
    }
    // absorb one-time session warmup outside any query's timing — touch the
    // machinery the queries actually use (parquet reader, shuffle, window,
    // codegen) rather than a bare range scan
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_name").count()
        .withColumn("rn", row_number().over(Window.orderBy("r_name")))
        .collect()
    }
    // a broken query must fail the bench loudly, not silently record ~0s
    // (which would *improve* the total); record the error per-query and
    // exit nonzero after the survivors have still been timed
    var errors = Map.empty[String, String]
    val results = selected.map { case (name, fn) =>
      // per-query warmup: run the query once untimed so the timed run
      // measures steady state. Without this, a query's number depends on its
      // POSITION in the suite (JIT/codegen warmth accumulated from earlier
      // queries) — and since Map iteration order shifts whenever a query is
      // added, round-over-round comparisons saw phantom 2-3× "regressions"
      // on unchanged queries (r3's q42/q43). Costs ~2× bench wall-clock.
      // NonFatal only: swallowing an OutOfMemoryError here would let the
      // timed run execute in a corrupted JVM (and eat the interrupt flag)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () } // reported from the timed run below
      // median of 3 timed runs: the warmup fixed position dependence, but a
      // SINGLE timed sample is still hostage to scheduler/GC luck — r5's
      // official snapshot recorded 2.5-3× phantom outliers (q34/q30) that
      // three independent measurements contradicted. The median discards one
      // bad draw in either direction; ~1.5× wall-clock over warmup+time-once
      // buys trustworthy round-over-round deltas.
      val samples = (1 to 3).map { _ =>
        // drain prior garbage so earlier runs' collection pauses don't bleed in
        System.gc()
        val t0 = System.nanoTime()
        // noop sink materializes every output column — `.count()` would let
        // Spark prune unreferenced projections for some plans
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case scala.util.control.NonFatal(e) =>
            errors += name -> (e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").take(200).replaceAll("[\"\\\\\n\r]", " "))
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> samples.sorted.apply(1)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // "metric"/"value" lead the line and "total_sec" repeats the headline at
    // its END, so a log capture that keeps only the head OR only the tail of
    // a long line still carries the total (r6's round artifact lost it to
    // tail truncation); the FULL line is additionally written to
    // bench_last.json, which never depends on log-tail length
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","total_sec":$total}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), line + "\n")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"BENCH FAILED: ${errors.size} quer${if (errors.size == 1) "y" else "ies"} errored: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
