package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** The `spark.sql.extensions` entry point — production packaging of the
  * engine's custom Catalyst surface (public API:
  * `SparkSessionExtensions.injectFunction` / `injectOptimizerRule`).
  * Start any session with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * and every graft codegen expression (the vector family: dot product,
  * LSH/MinHash/SimHash signatures, rolling hash, Bloom probe; the BPE
  * family: encode, ids) is present in the session's function registry from
  * session build — no per-session `register()` call, and therefore none of
  * the "function replaced" registry churn the temp-function route logs.
  * The operator layer keeps calling `register()` defensively (idempotent,
  * and it keeps plain sessions working), but a fleet deployment sets the
  * extension once in `spark-defaults.conf` and every JDBC/notebook/job
  * session is graft-capable.
  *
  * Also injected: [[GlobalWindowGuard]], an OPT-IN optimizer-level scale
  * gate (default off — see its doc). Injecting it unconditionally is safe
  * because it no-ops unless its conf flag is set on the session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.funcs.VectorFunctions.injectInto(ext)
    graft.funcs.BpeFunctions.injectInto(ext)
    graft.funcs.WordPieceFunctions.injectInto(ext)
    graft.funcs.TextFunctions.injectInto(ext)
    ext.injectOptimizerRule(_ => GlobalWindowGuard)
  }
}

/** Opt-in optimizer gate against the single most common scale killer in
  * user-composed pipelines: a window function with NO partition spec,
  * which funnels the entire input through one task. Spark only WARNs
  * ("Moving all data to a single partition"), and on a 100 TB input the
  * warning scrolls past and the job hangs for hours instead of failing.
  * With
  *
  * {{{
  *   spark.graft.failOnGlobalWindow=true
  * }}}
  *
  * set on a session (sessions built via [[GraftExtensions]]), any plan
  * that still contains a partitionless Window AFTER optimization fails
  * fast at planning time with a message naming the window expressions —
  * the production form of the PlansSpec regression gate. Default off:
  * the tabulation layer legitimately runs partitionless windows over
  * presentation-sized pivots (see PlansSpec's allowlist), so the flag is
  * a per-job dial for corpus-scale pipelines, not a blanket policy.
  *
  * Injected as a late optimizer rule; it rewrites nothing (identity), so
  * it cannot perturb any plan — it only inspects. */
object GlobalWindowGuard extends Rule[LogicalPlan] {
  val FlagKey = "spark.graft.failOnGlobalWindow"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(FlagKey, "false").toBoolean) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          throw new IllegalStateException(
            s"$FlagKey: plan contains a partitionless Window (all rows " +
              s"would funnel through ONE task at scale): " +
              w.windowExpressions.map(_.sql).mkString(", ") +
              " — partition the window, or unset the flag for " +
              "presentation-sized inputs")
        case _ =>
      }
    }
    plan
  }
}
