package graft.sources

import java.sql.{DriverManager, Timestamp}
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Exercises the JDBC read path (the reference's actual deployment mode,
  * flat_obs_v1.0.sql:60) against an embedded Derby database: the
  * partitioned read must land `numPartitions` tasks and the watermark
  * delta predicate must be PUSHED to the database, not evaluated in Spark.
  */
class JdbcSourceSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftJdbc;create=true"

  private def ts(s: String) = Timestamp.valueOf(s)

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA openmrs")
    st.execute(
      """CREATE TABLE openmrs.encounter (
        |  encounter_id INT NOT NULL PRIMARY KEY,
        |  patient_id INT,
        |  encounter_datetime TIMESTAMP,
        |  encounter_type INT,
        |  date_created TIMESTAMP,
        |  voided INT)""".stripMargin)
    val ins = conn.prepareStatement(
      "INSERT INTO openmrs.encounter VALUES (?, ?, ?, ?, ?, ?)")
    (1 to 200).foreach { i =>
      ins.setInt(1, i)
      ins.setInt(2, i % 40)
      ins.setTimestamp(3, ts("2015-01-01 09:00:00"))
      ins.setInt(4, if (i % 2 == 0) 21 else 22)
      // half the rows before the watermark, half after
      ins.setTimestamp(5,
        if (i <= 100) ts("2015-01-01 12:00:00") else ts("2015-03-01 12:00:00"))
      ins.setInt(6, 0)
      ins.addBatch()
    }
    ins.executeBatch()
    conn.close()
  }

  test("partitioned JDBC read: numPartitions tasks, watermark predicate pushed") {
    val cfg = OpenMrsSource.JdbcConfig(url, user = "", password = "", numPartitions = 8)
    val df = OpenMrsSource.jdbc(spark, cfg, "encounter",
      partitionColumn = "encounter_id", lowerBound = 1L, upperBound = 201L)

    // the partition split must reach the scan: 8 parallel range queries
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 200)

    // watermark delta: the filter must be pushed into the JDBC scan
    val wm = ts("2015-02-01 00:00:00")
    val delta = df.filter(col("date_created") > lit(wm))
    val physical = delta.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters"))
    assert(physical.toLowerCase.contains("greaterthan(date_created"))
    assert(delta.count() == 100)

    // and the pushed scan still partitions
    assert(delta.rdd.getNumPartitions == 8)
  }

  test("JDBC source feeds a stage end-to-end") {
    val cfg = OpenMrsSource.JdbcConfig(url, user = "", password = "", numPartitions = 4)
    val enc = OpenMrsSource.jdbc(spark, cfg, "encounter",
      partitionColumn = "encounter_id", lowerBound = 1L, upperBound = 201L)
    // clinical-encounter filter + projection, the shape every stage applies
    val clinical = enc.filter(col("encounter_type").isin(21, 22) && col("voided") === 0)
      .select("encounter_id", "patient_id", "encounter_type")
    assert(clinical.count() == 200)
    assert(clinical.select(countDistinct(col("patient_id"))).first().getLong(0) == 40)
  }
}
