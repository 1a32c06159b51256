package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark implementation plus (when
  * SQL-expressible) an equivalent ANSI/DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  *
  * `prepare`, when present, materializes immutable harness fixtures
  * (e.g. a streaming query's source-file splits) OUTSIDE any timed
  * region: the bench invokes it before starting the clock, and `run`
  * must behave identically whether or not it was called first (the
  * fixture builders are idempotent per (query, sf dir) caches).
  */
final case class OpQuery(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame,
    prepare: Option[(SparkSession, String) => Unit] = None)

object OpQuery {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, Some(oracle), run)

  /** As [[sql]], with an untimed fixture-prep hook. */
  def sqlPrepared(name: String, oracle: String)(prep: (SparkSession, String) => Unit)(
      run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, Some(oracle), run, Some(prep))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, None, run)
}
