package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (not part of the library surface): band-bucket statistics
  * for the q46 centered-LSH pipeline — bucket-size histogram, candidate-pair
  * mass, and stage timings. Run: `runMain graft.tools.DebugBands [sfDir]`. */
object DebugBands {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Multimodal, Similarity}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import spark.implicits._
    val docs = graft.Tables.read(spark, dir, "documents")
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
      .as[Multimodal.MediaRow]
    val emb = Multimodal.embed(media).toDF()
    time("embed.count")(emb.count())

    val p = Similarity.prepared(emb, "id", "embedding")
    // replicate centerThresholds
    val thresholds = time("thresholds") {
      val stats = p
        .select(posexplode(transform(col("v"),
          x => floor(x.cast("double") * 1000000.0).cast("long"))).as(Seq("d", "q")))
        .groupBy(col("d")).agg(sum(col("q")).as("s"), count(lit(1)).as("c"))
        .collect()
      val dims = stats.length
      val mu = new Array[Long](dims)
      stats.foreach(r => mu(r.getInt(0)) = Math.floorDiv(r.getLong(1), r.getLong(2)))
      println(s"[debug] dims=$dims n=${stats.head.getLong(2)} mu.head=${mu.take(4).mkString(",")}")
      (0 until 512).map(pl =>
        (0 until dims).map(d => graft.funcs.LshPlanes.mix(pl, d, dims) * mu(d)).sum)
    }
    val bits = 512; val bands = 32; val rows = 16
    val words = (0 until 8).map { w =>
      graft.funcs.VectorFunctions.lshSig(col("v"), 64, 64 * w,
        mix = true, thresholds = thresholds.slice(64 * w, 64 * w + 64))
    }
    val mask = lit((1L << rows) - 1)
    val keys = array((0 until bands).map { b =>
      val word = words((b * rows) / 64)
      val shift = (b * rows) % 64
      struct(lit(b).as("band"),
        shiftrightunsigned(word, shift).bitwiseAND(mask).as("v"))
    }: _*)
    val banded = p.select(col("id"), explode(keys).as("bk"))
    time("banded.count")(println("[debug] banded rows = " + banded.count()))
    val hist = time("bucket histogram") {
      banded.groupBy("bk").count()
        .agg(max("count").as("max"), sum(col("count") * (col("count") - 1) / 2).as("pairs"),
          count(lit(1)).as("buckets"))
        .collect()(0)
    }
    println(s"[debug] maxBucket=${hist.get(0)} candidatePairRows(withDup)=${hist.get(1)} buckets=${hist.get(2)}")
    val sigs = p.select(col("id"), words(0).as("w0")).collect()
    println("[debug] first word distinct values = " + sigs.map(_.getLong(1)).distinct.length + " of " + sigs.length)
    spark.stop()
  }
}
