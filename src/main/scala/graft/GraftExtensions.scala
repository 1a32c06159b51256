package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Standard Spark extensions entry point: lets a deployment install the
  * engine's SQL surface without code changes —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injected functions (SURVEY §2.10): `group_concat` (MySQL semantics,
  * byte-faithful truncation), `obs_value_for`, `obs_values_for`,
  * `obs_contains` — so a reference user's GROUP_CONCAT / obs-map SQL runs
  * in `spark.sql(...)` nearly verbatim.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.SqlFunctions.injections.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[GraftExtensions].getName, name),
          builder))
    }
}
