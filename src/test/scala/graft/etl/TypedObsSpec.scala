package graft.etl

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** `graft.etl.typedObs` wiring: flat_obs grows the typed obs_entries map
  * (from the same sorted collect as the string — both grains, salted and
  * unsalted), and the visit-summary stage fed the typed table emits
  * exactly what the string path emits.
  */
class TypedObsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture() = {
    val d1 = ts("2015-01-05 09:00:00")
    val persons = (1 to 4).map(p => Row(p, s"u-$p", 0))
    val encounters = (1 to 4).map(p => Row(p * 100, p, p * 10, d1, 21, 1, d1, null, 0))
    var id = 0
    val obs = (1 to 4).flatMap { p =>
      (1 to 12).map { i =>
        id += 1
        i % 4 match {
          case 0 => Row(id, p, p * 100, 6743, d1, null, 40.0 + (i % 7), null,
            null, null, null, null, d1, 0, null) // weight (multi-valued)
          case 1 => Row(id, p, p * 100, 1836, d1, 1065 + (i % 2), null, null,
            null, null, null, null, d1, 0, null) // pregnant decode
          case 2 => Row(id, p, p * 100, 1271, d1, if (i % 3 == 0) 5497 else 21,
            null, null, null, null, null, null, d1, 0, null) // tests ordered
          case _ => Row(id, p, if (i % 8 == 3) null else p * 100, 5096, d1, null, null,
            ts("2015-02-01 00:00:00"), null, null, null, null, d1, 0, null) // tca + grain 2
        }
      }
    }
    def df(rows: Seq[Row], schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    (df(obs, Schemas.obs), df(encounters, Schemas.encounter),
      df(persons, Schemas.person))
  }

  test("typed flat_obs decodes to the same visit summary as the string path") {
    val (obs, enc, person) = fixture()
    val personD = person.toDF("person_id", "uuid", "voided")
    val orders = enc.select(col("encounter_id"),
      concat(lit("o"), col("encounter_id")).as("orders"))

    def summary(flat: org.apache.spark.sql.DataFrame): Seq[String] =
      FlatVisitSummary.build(flat, orders, personD)
        .orderBy("encounter_id").collect().map(_.toString).toSeq

    // the string-only schema is the opt-IN fidelity mode now (round 5:
    // typed is the default); absent conf must produce the typed column
    spark.conf.set(FlatObs.TypedConfKey, "false")
    val plain = FlatObs.build(obs, enc, person)
    assert(!plain.columns.contains("obs_entries"))
    val viaString = summary(plain)
    try {
      spark.conf.unset(FlatObs.TypedConfKey) // default = typed
      val typedFlat = FlatObs.build(obs, enc, person).cache()
      assert(typedFlat.columns.contains("obs_entries"))
      // the map agrees with the string rendering entry for entry
      val r = typedFlat.filter(col("encounter_id") === 100)
        .select(col("obs"), col("obs_entries")).head()
      val fromString = r.getString(0).split(" \\## ").toSeq
        .map(_.stripPrefix("!!").stripSuffix("!!"))
      val m = r.getMap[Int, scala.collection.Seq[String]](1)
      val fromMap = m.toSeq.sortBy(_._1)
        .flatMap { case (c, vs) => vs.map(v => s"$c=$v") }
      assert(fromString.sorted == fromMap.sorted && m.nonEmpty)
      // decode equivalence through the real stage
      assert(summary(typedFlat) == viaString)
      // salted + typed composes
      spark.conf.set(FlatObs.SaltConfKey, "5")
      assert(summary(FlatObs.build(obs, enc, person)) == viaString)
    } finally {
      spark.conf.unset(FlatObs.TypedConfKey)
      spark.conf.unset(FlatObs.SaltConfKey)
    }
  }
}
