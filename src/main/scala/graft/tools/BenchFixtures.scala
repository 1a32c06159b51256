package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed OpenMRS-shaped source generator for the bench tools —
  * unlike the spec fixture (driver-side Seq, fine at 40 persons), every
  * table here is a `spark.range` projection, so generating the sf0.1-
  * shaped timeline (hundreds of thousands of obs) costs one codegen'd
  * scan and the generator itself would scale to the 100 TB shape.
  *
  * All columns derive from `hash(id)` arithmetic — deterministic, no RNG
  * state, identical across runs and partitionings. The timeline
  * concentrates the delta the way a real CDC tick does: ~2% of persons
  * are "active" between t1=day60 and t2=day90 — a quarter of their
  * encounters (with obs and orders) land in days 60-89, some of their
  * old encounters get a delta-window `date_changed`, and their voids
  * land in the delta window — while the other 98% of persons are
  * untouched, so an incremental tick's work and write volume should be
  * proportional to the active set, not the table.
  */
object BenchFixtures {

  private val Base = Timestamp.valueOf("2015-01-01 00:00:00")
  private val BaseEpoch = Base.toInstant.getEpochSecond

  def dayTs(day: Column, hour: Int): Column =
    (lit(BaseEpoch) + day.cast("long") * 86400L + lit(hour.toLong) * 3600L)
      .cast("timestamp")

  def asOf(day: Int): Timestamp =
    new Timestamp((BaseEpoch + day.toLong * 86400L) * 1000L)

  private def h(c: Column, salt: Int): Column = abs(hash(c, lit(salt)))

  /** The coded decode concepts the visit-summary stage reads, as a
    * (concept, code) lookup indexed by hash — coverage for the ~25 decode
    * blocks without a driver-side table. */
  private val codedPairs: Seq[(Int, Int)] = Seq(
    1836 -> 1065, 1836 -> 1066, 1836 -> 6765, 5271 -> 1065, 5271 -> 6765,
    374 -> 190, 374 -> 780, 6150 -> 1066, 6150 -> 6183, 6175 -> 1107,
    1353 -> 1356, 6760 -> 1384, 6760 -> 1385, 6794 -> 6790, 6761 -> 1386,
    1565 -> 1427, 6785 -> 1065, 6784 -> 1066, 6171 -> 1413, 1592 -> 1405,
    1571 -> 628, 1571 -> 797, 1271 -> 5497, 1271 -> 856, 1272 -> 1107,
    1151 -> 5526, 6181 -> 6180, 1048 -> 1065, 1363 -> 1066, 6781 -> 1065,
    6780 -> 1066)

  private def pick(idx: Column, pairs: Seq[(Int, Int)], field: (Int, Int) => Int): Column =
    element_at(array(pairs.map(p => lit(field(p._1, p._2))): _*),
      (pmod(idx, lit(pairs.size)) + 1).cast("int"))

  /** person / encounter / obs / orders with `nPersons * encPerPerson`
    * encounters and `* obsPerEnc` obs. */
  def sources(
      spark: SparkSession,
      nPersons: Int,
      encPerPerson: Int = 8,
      obsPerEnc: Int = 6): Map[String, DataFrame] = {
    // all of an encounter's satellite rows (obs, orders) derive their
    // timeline from these shared functions of the LONG encounter id —
    // hash(int) and hash(long) of the same value differ, so every call
    // site must hash the same type
    def patientOf(encIdL: Column): Column = pmod(encIdL - 1, lit(nPersons.toLong)) + 1L
    def isDeltaPerson(pidL: Column): Column = h(pidL, 21) % 50 === 0
    def encDayOf(encIdL: Column): Column =
      when(isDeltaPerson(patientOf(encIdL)) && h(encIdL, 1) % 4 === 0,
        lit(60) + h(encIdL, 3) % 30)
        .otherwise(h(encIdL, 2) % 60)

    val person = spark.range(1, nPersons + 1L).select(
      col("id").cast("int").as("person_id"),
      format_string("uuid-%08d", col("id")).as("uuid"),
      when(col("id") % 19 === 0, 1).otherwise(0).as("voided"))

    val nEnc = nPersons.toLong * encPerPerson
    val encDay = encDayOf(col("id"))
    val encounter = spark.range(1, nEnc + 1).select(
      col("id").cast("int").as("encounter_id"),
      patientOf(col("id")).cast("int").as("patient_id"),
      when(h(col("id"), 4) % 4 === 0, lit(null).cast("int"))
        .otherwise((col("id") * 10).cast("int")).as("visit_id"),
      dayTs(encDay, 9).as("encounter_datetime"),
      element_at(array(lit(21), lit(22), lit(35), lit(45), lit(31)),
        (h(col("id"), 5) % 5 + 1).cast("int")).as("encounter_type"),
      (h(col("id"), 6) % 5 + 1).cast("int").as("location_id"),
      dayTs(encDay, 12).as("date_created"),
      // some of the active persons' OLD encounters get a delta-window
      // update (date_changed in days 60-89): the CDC update path
      when(isDeltaPerson(patientOf(col("id"))) && h(col("id"), 7) % 6 === 0
          && encDay < 60,
        dayTs(lit(60) + h(col("id"), 8) % 30, 12)).as("date_changed"),
      when(h(col("id"), 9) % 40 === 0, 1).otherwise(0).as("voided"))

    val nObs = nEnc * obsPerEnc
    val oEncId = (pmod(col("id") - 1, lit(nEnc)) + 1).cast("int")
    val oEncIdL = oEncId.cast("long")
    val oDay = encDayOf(oEncIdL)
    val r = h(col("id"), 10) % 10
    val hv = h(col("id"), 11)
    val obs = spark.range(1, nObs + 1).select(
      col("id").cast("int").as("obs_id"),
      (pmod(oEncId - 1, lit(nPersons)) + 1).cast("int").as("person_id"),
      // ~3% of obs are encounter-less (person-day grain W3/A8 path)
      when(h(col("id"), 12) % 33 === 0, lit(null).cast("int"))
        .otherwise(oEncId).as("encounter_id"),
      when(r === 0, when(hv % 2 === 0, 6743).otherwise(6744))
        .when(r === 1, when(hv % 2 === 0, 6746).otherwise(5096))
        .when(r === 2, lit(9001)).when(r === 3, lit(9002))
        .when(r === 4, when(hv % 2 === 0, 9003).otherwise(9004))
        .when(r === 5, element_at(
          array(lit(856), lit(5497), lit(730), lit(21), lit(653), lit(790)),
          (hv % 6 + 1).cast("int")))
        .otherwise(pick(hv, codedPairs, (c, _) => c)).cast("int").as("concept_id"),
      dayTs(oDay, 9).as("obs_datetime"),
      when(r >= 6, pick(hv, codedPairs, (_, v) => v)).cast("int").as("value_coded"),
      when(r === 0, (lit(40.0) + (hv % 120).cast("double")))
        .when(r === 5, (hv % 120000).cast("double") / 100.0 + 1.0).as("value_numeric"),
      when(r === 1, dayTs(h(col("id"), 13) % 80, 0)).as("value_datetime"),
      when(r === 2, (hv % 2).cast("int")).cast("int").as("value_boolean"),
      when(r === 3, format_string("note-%d", hv % 100)).as("value_text"),
      when(r === 4 && hv % 2 === 0, (lit(700) + hv % 9).cast("int")).as("value_drug"),
      when(r === 4 && hv % 2 === 1, element_at(
        array(lit(">"), lit("<"), lit("=")), (hv % 3 + 1).cast("int"))).as("value_modifier"),
      dayTs(oDay, 12).as("date_created"),
      // ~1.5% voided; active persons void in the delta window (days
      // 60-89) — the retraction path, including the retraction-only
      // person queue — everyone else's voids are old news by t1
      when(h(col("id"), 14) % 66 === 0, 1).otherwise(0).as("voided"),
      when(h(col("id"), 14) % 66 === 0,
        dayTs(when(isDeltaPerson(patientOf(oEncIdL)),
          lit(60) + h(col("id"), 16) % 30)
          .otherwise(h(col("id"), 16) % 55 + 2), 13)).as("date_voided"))

    val nOrders = nEnc / 3
    val ordEncId = (pmod(col("id") * 3 - 1, lit(nEnc)) + 1).cast("int")
    val ordEncIdL = ordEncId.cast("long")
    val ordDay = encDayOf(ordEncIdL)
    val orders = spark.range(1, nOrders + 1).select(
      col("id").cast("int").as("order_id"),
      patientOf(ordEncIdL).cast("int").as("patient_id"),
      ordEncId.as("encounter_id"),
      (lit(1000) + h(col("id"), 17) % 50).cast("int").as("concept_id"),
      dayTs(ordDay, 12).as("date_created"),
      when(h(col("id"), 18) % 20 === 0, 1).otherwise(0).as("voided"),
      when(h(col("id"), 18) % 20 === 0,
        dayTs(when(isDeltaPerson(patientOf(ordEncIdL)),
          lit(60) + h(col("id"), 19) % 30)
          .otherwise(h(col("id"), 19) % 55 + 2), 14)).as("date_voided"))

    Map("person" -> person, "encounter" -> encounter, "obs" -> obs, "orders" -> orders)
  }

  /** Source-table view as of `t`: rows created by then; voids and updates
    * that happen after `t` are not yet visible. */
  def obsAsOf(obs: DataFrame, t: Timestamp): DataFrame =
    obs.filter(col("date_created") <= lit(t))
      .withColumn("voided",
        when(col("voided") === 1 && col("date_voided") <= lit(t), 1).otherwise(0))
      .withColumn("date_voided", when(col("voided") === 1, col("date_voided")))

  def encAsOf(enc: DataFrame, t: Timestamp): DataFrame =
    enc.filter(col("date_created") <= lit(t))
      .withColumn("date_changed",
        when(col("date_changed") <= lit(t), col("date_changed")))

  def ordersAsOf(orders: DataFrame, t: Timestamp): DataFrame =
    obsAsOf(orders, t) // same created/voided column shape
}
