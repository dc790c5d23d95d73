package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the storage/bandwidth
  * path for similarity search at corpus scale: a 64-dim float32 vector is
  * 256 bytes; quantized it is 64 bytes + one float scale, a 4× cut in scan
  * I/O and shuffle width for candidate generation, with the full-precision
  * vectors touched only for final re-ranking (or not at all when the
  * quantized ranking suffices). (Beyond the reference surface; required by
  * the build brief's similarity-search scale path.)
  *
  * Determinism: quantization is symmetric per-vector max-abs scaling —
  * `q_i = round(v_i / (max|v| / 127))` — so every quantized component is an
  * integer in [−127, 127], quantized dot products and norms are EXACT integer
  * arithmetic, and quantized cosines are bit-reproducible across engines and
  * partition orders (the one sqrt/divide happens on exact integer inputs,
  * then rounds to 6 dp). That exactness is what lets the DuckDB oracle mirror
  * the whole quantized-ANN pipeline (q56) value-for-value.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization: (id, q: array<tinyint>, scale).
    * `scale = max|v|/127`; a zero vector quantizes to zeros with scale 0.
    * Pure projection — zero shuffle, embarrassingly parallel. Reconstruction
    * is `q_i · scale` with relative L2 error ≤ ~0.5/127 per component
    * (spec-asserted < 1% on the fixture corpus). */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = Similarity.toDouble(col(vecCol))
    df.select(col(idCol).as("id"), v.as("__v"))
      .withColumn("scale",
        aggregate(col("__v"), lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0)
      .withColumn("q",
        when(col("scale") > 0,
          transform(col("__v"), x => round(x / col("scale")).cast("tinyint")))
          .otherwise(transform(col("__v"), _ => lit(0).cast("tinyint"))))
      .select(col("id"), col("q"), col("scale"))
  }

  /** Brute-force top-k by QUANTIZED cosine: `dot(q_a, q_b) / (|q_a|·|q_b|)`
    * — scale factors cancel, so the ranking needs only the int8 vectors.
    * Same plan shape as [[Similarity.annTopK]] (small query side broadcast,
    * one corpus scan, per-query window rank) but the scan reads the 4×
    * narrower quantized column. The int8 components are carried as floats
    * (every value in [−127,127] is exact in float32) so the dot product runs
    * through the codegen'd [[graft.funcs.DotProductFloat]] loop; products and
    * sums stay ≤ 2²⁰, far inside double's exact-integer range, so
    * `qcos_sim` is deterministic. */
  def annTopKQuantized(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, topK: Int): DataFrame = {
    graft.funcs.VectorFunctions.register(corpus.sparkSession)
    def preparedQ(df: DataFrame) =
      quantize(df, idCol, vecCol)
        .withColumn("qf", transform(col("q"), _.cast("float")))
        .withColumn("qn",
          sqrt(graft.funcs.VectorFunctions.dotF(col("qf"), col("qf"))))
        .select(col("id"), col("qf"), col("qn"))
    val c = preparedQ(corpus)
    val q = preparedQ(queries)
      .select(col("id").as("qid"), col("qf").as("qqf"), col("qn").as("qqn"))
    val qcos = round(graft.funcs.VectorFunctions.dotF(col("qqf"), col("qf")) /
      (col("qqn") * col("qn")), 6)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("qcos_sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor_id"), qcos.as("qcos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Relative L2 reconstruction error per vector:
    * `‖v − q·scale‖ / ‖v‖` — the quantization-quality diagnostic. */
  def reconstructionError(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = Similarity.toDouble(col(vecCol))
    quantize(df, idCol, vecCol)
      .join(df.select(col(idCol).as("id"), v.as("__v")), Seq("id"))
      .withColumn("__r", zip_with(col("__v"), col("q"),
        (x, qi) => x - qi.cast("double") * col("scale")))
      .select(col("id"),
        (Similarity.l2Norm(col("__r")) / Similarity.l2Norm(col("__v")))
          .as("rel_err"))
  }
}
