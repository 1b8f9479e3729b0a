package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.plans.{GraftCallStrategy, GraftDmlStrategy, GraftFunctions, GraftSqlParser, TopKPerKeyStrategy}

/** Session-extension packaging for the whole engine: one injector
  * registers every native SQL function (vec_dot / vec_norm / vec_cosine /
  * simhash64 / topk_freq), the TopKPerKey planner strategy, and the
  * `CALL graft_*` maintenance-procedure parser (compact / clustered
  * compact / vacuum from pure SQL — prefix-gated, every other statement
  * delegates to Spark's parser verbatim).
  *
  * Wire it the standard way —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions          // config, or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * — so a 1000-executor deployment gets the operators from config alone,
  * with no per-session mutation (`spark.experimental` is not touched).
  * For an already-built session, [[graft.plans.GraftFunctions.register]]
  * installs the same functions as temp functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectPlannerStrategy(_ => GraftCallStrategy)
    ext.injectPlannerStrategy(_ => GraftDmlStrategy)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    GraftFunctions.sqlFunctions.foreach { case (name, usage, builder) =>
      ext.injectFunction((GraftFunctions.identifier(name),
        GraftFunctions.expressionInfo(name, usage), builder))
    }
  }
}
