package graft.etl

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Row

/** Deterministic OpenMRS-shaped synthetic data (FIXTURES.md §1): persons,
  * encounters, EAV obs (all 7 value types, encounter-less groups, repeats,
  * voids, updates), orders — sized to exercise every operator in SURVEY §2
  * including the decode concepts flat_visit_summary reads.
  */
object OpenMrsFixture {

  /** Decode-relevant coded concepts: (concept, candidate codes). */
  private val codedConcepts: Seq[(Int, Seq[Int])] = Seq(
    1836 -> Seq(1065, 1066, 6765, 50, 6847, 6848), // pregnancy
    5271 -> Seq(1065, 1066, 6765), // fp status
    374 -> Seq(190, 6495, 780, 5279, 1713), // fp method
    6150 -> Seq(1066, 6182, 6183, 6151), // tb status
    6175 -> Seq(1107, 5978, 512, 620), // side effects
    1353 -> Seq(1356, 1354, 6767, 1360), // patient source
    6760 -> Seq(1384, 1385, 1386, 1175, 8015), // arv adherence
    6794 -> Seq(6790, 1852), // who stage
    6761 -> Seq(1384, 1385, 1386), // ctx adherence
    1565 -> Seq(1427, 1066, 92), // ctx dispensed
    6785 -> Seq(1065, 1066, 1175), // inh
    6784 -> Seq(1065, 1066), // other meds
    6171 -> Seq(1413, 6169, 1410, 6168), // why poor
    1592 -> Seq(1405), // pmtct
    1571 -> Seq(628, 814, 6285, 6286, 797, 802), // regimen
    1271 -> Seq(5497, 21, 1569, 1883, 5622, 1107, 856), // tests ordered (repeats!)
    1272 -> Seq(1107, 5488, 1356, 1167), // refferal
    1151 -> Seq(5526, 1708, 6046), // breastfeeding
    6181 -> Seq(6180, 6090, 1505), // at-risk
    1048 -> Seq(1065, 1066, 1175), // pwp disclosure
    1363 -> Seq(1065, 1066), // partner tested
    6781 -> Seq(1065, 1066), // condoms
    6780 -> Seq(1065, 1066)) // sti

  private def ts(daysFromBase: Int, hour: Int = 10): Timestamp =
    Timestamp.from(
      Timestamp.valueOf("2015-01-01 00:00:00").toInstant
        .plusSeconds(daysFromBase.toLong * 86400 + hour.toLong * 3600))

  /** Generate the four source tables. Timeline: day 0..90 creations;
    * `voidDay`/`changeDay` mark retro-activity for incremental tests.
    */
  def generate(spark: SparkSession, nPersons: Int = 40, seed: Long = 42L)
      : Map[String, DataFrame] = {
    val rnd = new Random(seed)
    val persons = (1 to nPersons).map { pid =>
      Row(pid, f"uuid-$pid%04d", if (pid % 19 == 0) 1 else 0)
    }

    var obsId = 0
    var encId = 0
    var orderId = 0
    val encounters = Seq.newBuilder[Row]
    val obs = Seq.newBuilder[Row]
    val orders = Seq.newBuilder[Row]

    (1 to nPersons).foreach { pid =>
      val nEnc = 1 + rnd.nextInt(4)
      (0 until nEnc).foreach { k =>
        encId += 1
        val day = rnd.nextInt(60)
        val created = ts(day, 12)
        val encDt = ts(day, 9)
        val encType = Seq(21, 22, 35, 45, 31)(rnd.nextInt(5))
        val visitId: Integer = if (rnd.nextInt(4) == 0) null else Integer.valueOf(encId * 10)
        val changed: Timestamp = if (rnd.nextInt(6) == 0) ts(day + 30, 12) else null
        val voided = if (rnd.nextInt(25) == 0) 1 else 0
        encounters += Row(encId, pid, visitId, encDt, encType, 1 + rnd.nextInt(5),
          created, changed, voided)

        // obs for this encounter: mixed typed values + coded decode concepts
        val nObs = 2 + rnd.nextInt(6)
        (0 until nObs).foreach { _ =>
          obsId += 1
          val voidedObs = rnd.nextInt(12) == 0
          val dateVoided: Timestamp = if (voidedObs) ts(day + 20 + rnd.nextInt(30), 13) else null
          val r = rnd.nextInt(10)
          val row: Row = r match {
            case 0 => // numeric weight/height
              val c = if (rnd.nextBoolean()) 6743 else 6744
              Row(obsId, pid, encId, c, encDt, null, 40.0 + rnd.nextInt(120),
                null, null, null, null, null, created, if (voidedObs) 1 else 0, dateVoided)
            case 1 => // datetime (enrollment / tca)
              val c = if (rnd.nextBoolean()) 6746 else 5096
              Row(obsId, pid, encId, c, encDt, null, null, ts(day + rnd.nextInt(20)),
                null, null, null, null, created, if (voidedObs) 1 else 0, dateVoided)
            case 2 => // boolean
              Row(obsId, pid, encId, 9001, encDt, null, null, null, rnd.nextInt(2),
                null, null, null, created, if (voidedObs) 1 else 0, dateVoided)
            case 3 => // text
              Row(obsId, pid, encId, 9002, encDt, null, null, null, null,
                s"note-${rnd.nextInt(100)}", null, null, created,
                if (voidedObs) 1 else 0, dateVoided)
            case 4 => // drug / modifier
              if (rnd.nextBoolean())
                Row(obsId, pid, encId, 9003, encDt, null, null, null, null, null,
                  700 + rnd.nextInt(9), null, created, if (voidedObs) 1 else 0, dateVoided)
              else
                Row(obsId, pid, encId, 9004, encDt, null, null, null, null, null, null,
                  Seq(">", "<", "=")(rnd.nextInt(3)), created,
                  if (voidedObs) 1 else 0, dateVoided)
            case 5 => // lab numeric (panel concepts: CD4, HGB, viral load…)
              val c = Seq(856, 5497, 730, 21, 653, 790)(rnd.nextInt(6))
              Row(obsId, pid, encId, c, encDt, null, (rnd.nextInt(120000) / 100.0) + 1,
                null, null, null, null, null, created, if (voidedObs) 1 else 0, dateVoided)
            case _ => // coded decode concept
              val (c, codes) = codedConcepts(rnd.nextInt(codedConcepts.size))
              Row(obsId, pid, encId, c, encDt, codes(rnd.nextInt(codes.size)),
                null, null, null, null, null, null, created,
                if (voidedObs) 1 else 0, dateVoided)
          }
          obs += row
        }

        // orders for some encounters
        if (rnd.nextInt(3) == 0) {
          (0 to rnd.nextInt(3)).foreach { _ =>
            orderId += 1
            val ovoided = rnd.nextInt(10) == 0
            orders += Row(orderId, pid, encId, 1000 + rnd.nextInt(50), created,
              if (ovoided) 1 else 0,
              if (ovoided) ts(day + 25 + rnd.nextInt(30), 14) else null)
          }
        }
      }

      // encounter-less obs groups: same person+datetime clusters
      if (pid % 3 == 0) {
        val day = rnd.nextInt(60)
        val momentDt = ts(day, 8)
        (0 until 2 + rnd.nextInt(3)).foreach { _ =>
          obsId += 1
          val voidedObs = rnd.nextInt(8) == 0
          val (c, codes) = codedConcepts(rnd.nextInt(codedConcepts.size))
          obs += Row(obsId, pid, null, c, momentDt, codes(rnd.nextInt(codes.size)),
            null, null, null, null, null, null, ts(day, 16),
            if (voidedObs) 1 else 0, if (voidedObs) ts(day + 22, 15) else null)
        }
      }
    }

    def df(rows: Seq[Row], schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)

    Map(
      "person" -> df(persons, Schemas.person),
      "encounter" -> df(encounters.result(), Schemas.encounter),
      "obs" -> df(obs.result(), Schemas.obs),
      "orders" -> df(orders.result(), Schemas.orders))
  }
}
