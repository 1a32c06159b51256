package graft.etl

import org.apache.spark.sql.types._

/** Declared schemas for the OpenMRS-shaped sources the reference reads and
  * the flat tables it writes (SURVEY §1.3; DDL citations inline).
  */
object Schemas {

  /** openmrs.encounter — columns the reference touches
    * (flat_obs_v1.0.sql:117-122, 84-86). */
  val encounter: StructType = StructType(Seq(
    StructField("encounter_id", IntegerType, nullable = false),
    StructField("patient_id", IntegerType),
    StructField("visit_id", IntegerType),
    StructField("encounter_datetime", TimestampType),
    StructField("encounter_type", IntegerType),
    StructField("location_id", IntegerType),
    StructField("date_created", TimestampType),
    StructField("date_changed", TimestampType),
    StructField("voided", IntegerType)))

  /** openmrs.obs — EAV rows with 7 typed value columns
    * (flat_obs_v1.0.sql:125-131). */
  val obs: StructType = StructType(Seq(
    StructField("obs_id", IntegerType, nullable = false),
    StructField("person_id", IntegerType),
    StructField("encounter_id", IntegerType),
    StructField("concept_id", IntegerType),
    StructField("obs_datetime", TimestampType),
    StructField("value_coded", IntegerType),
    StructField("value_numeric", DoubleType),
    StructField("value_datetime", TimestampType),
    StructField("value_boolean", IntegerType),
    StructField("value_text", StringType),
    StructField("value_drug", IntegerType),
    StructField("value_modifier", StringType),
    StructField("date_created", TimestampType),
    StructField("voided", IntegerType),
    StructField("date_voided", TimestampType)))

  /** openmrs.orders (flat_orders_v1.0.sql:47-48,58-67). */
  val orders: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = false),
    StructField("patient_id", IntegerType),
    StructField("encounter_id", IntegerType),
    StructField("concept_id", IntegerType),
    StructField("date_created", TimestampType),
    StructField("voided", IntegerType),
    StructField("date_voided", TimestampType)))

  /** openmrs.person (flat_obs_v1.0.sql:338-340;
    * flat_visit_summary_v1.0.sql:528). */
  val person: StructType = StructType(Seq(
    StructField("person_id", IntegerType, nullable = false),
    StructField("uuid", StringType),
    StructField("voided", IntegerType)))

  /** flat_obs target (flat_obs_v1.0.sql:36-51). */
  val flatObs: StructType = StructType(Seq(
    StructField("person_id", IntegerType),
    StructField("visit_id", IntegerType),
    StructField("encounter_id", IntegerType, nullable = false),
    StructField("encounter_datetime", TimestampType),
    StructField("encounter_type", IntegerType),
    StructField("location_id", IntegerType),
    StructField("obs", StringType),
    StructField("obs_datetimes", StringType),
    StructField("max_date_created", TimestampType)))

  /** flat_orders target (flat_orders_v1.0.sql:18-32). NB quirk §7.4.1: the
    * reference inserts location_id into the date_activated slot; the
    * rebuild names the column what it actually holds. */
  val flatOrders: StructType = StructType(Seq(
    StructField("person_id", IntegerType),
    StructField("encounter_id", IntegerType, nullable = false),
    StructField("order_id", IntegerType),
    StructField("encounter_datetime", TimestampType),
    StructField("encounter_type", IntegerType),
    StructField("location_id", IntegerType),
    StructField("orders", StringType),
    StructField("order_datetimes", StringType),
    StructField("max_date_created", TimestampType)))

  /** flat_lab_obs target (flat_lab_obs_v1.0.sql:47-62). */
  val flatLabObs: StructType = StructType(Seq(
    StructField("person_id", IntegerType),
    StructField("encounter_id", IntegerType, nullable = false),
    StructField("test_datetime", TimestampType),
    StructField("encounter_type", IntegerType),
    StructField("location_id", IntegerType),
    StructField("obs", StringType),
    StructField("max_date_created", TimestampType),
    StructField("encounter_ids", StringType),
    StructField("obs_ids", StringType)))
}
