package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateStruct, Expression, Literal}
import org.apache.spark.sql.types.StringType

/** SQL-surface registration: expose the engine's MySQL-compat functions to
  * `spark.sql(...)` so a reference user's GROUP_CONCAT / obs-map SQL runs
  * nearly verbatim.
  *
  * After `SqlFunctions.register(spark)`:
  * {{{
  *   SELECT group_concat(concept_id, concept_id, value_coded) FROM obs GROUP BY encounter_id
  *   SELECT obs_value_for(obs, 6743) FROM flat_obs
  * }}}
  */
object SqlFunctions {

  /** name → expression builder, shared by [[register]] (session-level
    * temp functions) and [[graft.GraftExtensions]] (config-level
    * injection via `spark.sql.extensions`).
    */
  val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // group_concat(value, sortKey...) — MySQL semantics incl. 100k
    // truncation. The value is cast to string here (MySQL coerces any
    // argument type); without it GroupConcatAgg.update's UTF8String cast
    // would throw on the doc's own `group_concat(concept_id, ...)`
    // example (an int column).
    "group_concat" -> { exprs =>
      GroupConcatAgg(Cast(exprs.head, StringType),
        CreateStruct(exprs.tail.toIndexedSeq))
    },
    // obs_value_for(obs, conceptId) — first value for a concept
    "obs_value_for" -> { exprs =>
      colToExpr(exprs, (obs, c) => ObsMap.valueFor(obs, c))
    },
    // obs_values_for(obs, conceptId) — all values (array)
    "obs_values_for" -> { exprs =>
      colToExpr(exprs, (obs, c) => ObsMap.valuesFor(obs, c))
    },
    // obs_contains(obs, conceptId, code) — decode predicate
    "obs_contains" -> { exprs =>
      val concept = literalInt(exprs(1), "obs_contains concept")
      val code = exprs(2) match {
        case Literal(v, _) => String.valueOf(v)
        case other => throw new IllegalArgumentException(
          s"obs_contains code must be a literal, got $other")
      }
      toExpr(ObsMap.containsEntry(col(exprs.head), concept, code))
    })

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    injections.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  private def col(e: Expression) =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  private def toExpr(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  private def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def colToExpr(
      exprs: Seq[Expression],
      f: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column): Expression =
    toExpr(f(col(exprs.head), literalInt(exprs(1), "concept id")))
}
