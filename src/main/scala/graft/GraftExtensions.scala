package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions hook so spark-submit users get every graft_*
  * function without calling GraftFunctions.register:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * (Functions are injected into the session FunctionRegistry; expressions
  * and aggregates are the same Catalyst nodes the Column facade builds.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injectInto(ext)
}
