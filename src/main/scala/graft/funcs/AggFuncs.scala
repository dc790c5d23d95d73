package graft.funcs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registry mapping the reference's `aggfunc: str` names (pandas aggregation
  * names accepted by `DataFrame.agg`; reference aggregation.py:105-118) to
  * codegen'd Spark aggregate expressions. Custom Scala functions plug in via
  * [[register]] (the reference's `Callable` path); prefer
  * `org.apache.spark.sql.expressions.Aggregator` + `functions.udaf` for real
  * custom aggregation state.
  */
object AggFuncs {

  type AggFn = Column => Column

  private val builtins: Map[String, AggFn] = Map(
    "sum"     -> (c => sum(c)),
    "mean"    -> (c => avg(c)),
    "avg"     -> (c => avg(c)),
    "min"     -> (c => min(c)),
    "max"     -> (c => max(c)),
    "count"   -> (c => count(c)),
    "size"    -> (_ => count(lit(1))),
    "median"  -> (c => median(c)),
    "std"     -> (c => stddev_samp(c)),
    "var"     -> (c => var_samp(c)),
    "sem"     -> (c => stddev_samp(c) / sqrt(count(c))),
    "nunique" -> (c => count_distinct(c)),
    "first"   -> (c => first(c, ignoreNulls = true)),
    "last"    -> (c => last(c, ignoreNulls = true)),
    "prod"    -> (c => product(c)),
    "skew"    -> (c => skewness(c)),
    "kurt"    -> (c => kurtosis(c)),
    "any"     -> (c => max(c.cast("boolean"))),
    "all"     -> (c => min(c.cast("boolean")))
  )

  @volatile private var custom: Map[String, AggFn] = Map.empty

  /** Register a custom aggregate under a name (Callable equivalent). */
  def register(name: String, fn: AggFn): Unit = synchronized { custom += name -> fn }

  /** Parameterized aggfunc names — the argument channel of the reference's
    * `DataFrame.agg(func, *args)` passthrough (aggregation.py:105-118), spelt
    * `"name:arg1,arg2"`. `quantile:p` maps to Spark's EXACT linearly
    * interpolated `percentile` (same interpolation as pandas `quantile` and
    * DuckDB `quantile_cont`, so results are oracle-comparable bit-for-bit).
    */
  private def parameterized(name: String): Option[AggFn] =
    name.split(":", 2) match {
      case Array(base, argStr) =>
        val args = argStr.split(",").map(_.trim)
        base match {
          case "quantile" | "percentile" =>
            require(args.length == 1, s"$base takes one argument, got ${args.length}")
            val p = args.head.toDouble
            require(p >= 0 && p <= 1, s"quantile must be in [0, 1], got $p")
            Some(c => percentile(c, lit(p)))
          case _ => None
        }
      case _ => None
    }

  def apply(name: String): AggFn =
    custom.get(name)
      .orElse(builtins.get(name))
      .orElse(parameterized(name))
      .getOrElse(throw new IllegalArgumentException(s"unknown aggfunc '$name'"))

  def isKnown(name: String): Boolean =
    custom.contains(name) || builtins.contains(name) ||
      scala.util.Try(parameterized(name)).toOption.flatten.isDefined

  /** Row-wise (column-axis) variant of an aggfunc across a set of value
    * columns — the structural replacement for the reference's transpose trick
    * (tooling.py:31-43). Null handling mirrors pandas skipna semantics:
    * sum of an all-null row is 0, mean of an all-null row is null.
    */
  def rowwise(name: String, cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "row-wise aggregate over zero columns")
    def nonNullCount = cols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)
    // natural-type addition: preserves long/decimal exactness (pandas keeps
    // integer dtype for integer row sums; casting here would also break the
    // engine's exact-decimal aggregation discipline)
    def sumExpr = cols.map(c => coalesce(c, lit(0))).reduce(_ + _)
    name match {
      case "sum"          => sumExpr
      case "mean" | "avg" => when(nonNullCount > 0, sumExpr / nonNullCount)
      case "min"          => least(cols: _*)
      case "max"          => greatest(cols: _*)
      case "count"        => nonNullCount
      case "size"         => lit(cols.size)
      case other =>
        throw new IllegalArgumentException(s"aggfunc '$other' not supported on the column axis")
    }
  }
}
