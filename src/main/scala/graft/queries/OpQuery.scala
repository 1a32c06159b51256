package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark implementation plus (when
  * SQL-expressible) an equivalent ANSI/DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  */
final case class OpQuery(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object OpQuery {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, Some(oracle), run)

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, None, run)
}
