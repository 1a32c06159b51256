package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source layer for the openmrs tables (SURVEY §2.1 S1-S5).
  *
  * Two modes:
  *  - **snapshot**: parquet snapshots of the replicated source DB — the
  *    deployment this repo tests (columnar scans, min/max pruning on the
  *    `date_created` watermark predicate for free);
  *  - **jdbc**: read the live MySQL replica the way the reference does
  *    (flat_obs_v1.0.sql:60 "this breaks when replication is down") —
  *    predicate pushdown ships the watermark delta filter to MySQL, and
  *    `partitionColumn` splits the scan across executors.
  *
  * Incremental scans should push `col("date_created") > wm` immediately
  * after these readers so it reaches the source (PushedFilters in the scan
  * node / WHERE in the JDBC query).
  */
object OpenMrsSource {

  final case class JdbcConfig(
      url: String,
      user: String,
      password: String,
      fetchSize: Int = 10000,
      numPartitions: Int = 32)

  def snapshot(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** JDBC read partitioned on the table's integer PK so all executors pull
    * in parallel (a single-partition JDBC scan is the classic bottleneck).
    */
  def jdbc(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", s"openmrs.$table")
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("fetchsize", cfg.fetchSize)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", cfg.numPartitions)
      .option("pushDownPredicate", true)
      .load()

  /** S5: the reference's disabled test-patient filter
    * (flat_obs_v1.0.sql:90-95) — remove rows whose person has
    * person_attribute_type_id=28 AND value='true'. Kept behind an explicit
    * call since the reference ships it commented out.
    */
  def excludeTestPatients(rows: DataFrame, personAttribute: DataFrame): DataFrame = {
    val testPersons = personAttribute
      .filter(col("person_attribute_type_id") === 28 && col("value") === "true")
      .select("person_id").distinct()
    rows.join(broadcast(testPersons), Seq("person_id"), "left_anti")
  }
}
