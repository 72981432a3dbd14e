package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Standard deployment entry point:
  * `--conf spark.sql.extensions=graft.GraftExtensions` registers the graft
  * planner strategy at session build. (Function registration happens via
  * [[GraftSession.tune]] / [[graft.functions.GraftFunctions.register]],
  * which also covers externally-created sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
