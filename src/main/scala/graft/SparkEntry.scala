package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage catalog (one entry per implemented
  * operator from SURVEY §2 plus the LLM-data-pipeline extensions), each
  * paired with DuckDB oracle SQL over the same parquet tables in
  * `oracleSql`. Column names are aligned between the two on purpose — the
  * driver's compare sorts columns by name before hashing values.
  */
object SparkEntry {

  val catalog: Seq[OpQuery] =
    RelationalQueries.all ++ WindowQueries.all ++ ObsMapQueries.all ++
      IncrementalQueries.all ++ LlmQueries.all ++ CurationQueries.all ++
      EtlPipelineQueries.all ++ CompletenessQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.find(_.name == "q11_agg_pricing_summary").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    catalog.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
