package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` entry point: makes every graft native function
  * available to plain `spark.sql(...)` sessions via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the deployment shape
  * a shared 1000-executor cluster would use (no imperative registration).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // The whole-operator extension: the native as-of join's planner strategy
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
    // Function registration needs a live session's registry; inject via
    // a check rule that runs once at analysis start (idempotent registry ops).
    ext.injectCheckRule { session =>
      operators.Dedup.register(session)
      expressions.AccessLogParseExpr.register(session)
      expressions.VectorOps.register(session)
      expressions.LshPlanes.register(session)
      _ => ()
    }
  }
}
