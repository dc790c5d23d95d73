package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation: salting for hot keys. AQE's skew-join splitting
  * (on by default) is the first line of defense at runtime; salting is the
  * plan-level tool when the skew is known up front (a handful of hot join
  * keys or group keys holding a large share of a 100 TB table), or when the
  * skewed operator is an aggregation, which AQE's skew handling does not
  * cover. (Beyond the reference surface; required by the build brief.)
  */
object Skew {

  private val SaltCol = "__fb_salt"

  /** Deterministic per-row salt in [0, salt): hashed from the given columns
    * (pick high-cardinality ones) so repeated runs salt identically. */
  private def saltOf(salt: Int, from: Seq[Column]): Column =
    pmod(xxhash64(from: _*), lit(salt.toLong)).cast("int")

  /** Salted inner equi-join: the probe (large, skewed) side gets a
    * deterministic salt; the build side is replicated `salt` times so every
    * (key, salt) bucket finds its match. A hot key's rows spread over `salt`
    * reducers instead of one. Replication multiplies the build side by
    * `salt` — use when build ≪ probe but too big (or too mid-sized) to
    * broadcast outright.
    *
    * @param saltFrom probe-side columns to derive the salt from; defaults to
    *                 all probe columns
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salt: Int, saltFrom: Seq[String] = Nil): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val from = if (saltFrom.nonEmpty) saltFrom else probe.columns.toSeq
    val p = probe.withColumn(SaltCol, saltOf(salt, from.map(probe(_))))
    val b = build.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, keys :+ SaltCol).drop(SaltCol)
  }

  /** Salted two-stage aggregation for skewed group keys: a partial aggregate
    * on (keys, salt) spreads each hot group over `salt` reducers, then a
    * final aggregate on the keys combines the partials. Supported aggfuncs
    * are the decomposable ones: sum, count, min, max (mean = sum/count by
    * the caller). Note Spark's hash aggregation already does map-side
    * partial aggregation; explicit salting matters when the per-key partial
    * state itself is the bottleneck (e.g. huge `count_distinct` rewritten as
    * two-stage) or the single final reducer for a hot key still overloads.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                aggs: Seq[(String, String)], // (column, func)
                salt: Int, saltFrom: Seq[String] = Nil): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val supported = Set("sum", "count", "min", "max")
    aggs.foreach { case (_, f) =>
      require(supported(f), s"aggfunc '$f' is not decomposable for salting")
    }
    val from = if (saltFrom.nonEmpty) saltFrom else df.columns.toSeq
    val salted = df.withColumn(SaltCol, saltOf(salt, from.map(df(_))))
    def partial(c: String, f: String): Column = f match {
      case "sum"   => sum(col(c)).as(s"${f}__$c")
      case "count" => count(col(c)).as(s"${f}__$c")
      case "min"   => min(col(c)).as(s"${f}__$c")
      case "max"   => max(col(c)).as(s"${f}__$c")
    }
    def fin(c: String, f: String): Column = f match {
      case "sum"   => sum(col(s"${f}__$c")).as(s"${f}_$c")
      case "count" => sum(col(s"${f}__$c")).as(s"${f}_$c")
      case "min"   => min(col(s"${f}__$c")).as(s"${f}_$c")
      case "max"   => max(col(s"${f}__$c")).as(s"${f}_$c")
    }
    salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(aggs.map { case (c, f) => partial(c, f) }.head,
        aggs.map { case (c, f) => partial(c, f) }.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(aggs.map { case (c, f) => fin(c, f) }.head,
        aggs.map { case (c, f) => fin(c, f) }.tail: _*)
  }
}
