package graft.etl

import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Transcription-fidelity check: parses every regexp-decode arm out of the
  * reference's flat_visit_summary_v1.0.sql (read-only) and compares the
  * (concept=code → label) sequences — in arm order — against the tables
  * declared in [[FlatVisitSummary]]. A typo in any of the ~95 transcribed
  * arms (e.g. the 40-regimen table) fails here mechanically instead of
  * silently mislabeling a column.
  */
class DecodeTableFidelitySpec extends AnyFunSuite {

  private val RefPath = "/root/reference/flat_visit_summary_v1.0.sql"

  /** end-as name in the reference → our declared table. */
  private val tables: Map[String, Seq[(String, String)]] = Map(
    "pregnancy" -> FlatVisitSummary.pregnant,
    "fpstatus" -> FlatVisitSummary.fpStatus,
    "fpmethod" -> FlatVisitSummary.fpMethod,
    "why_not_on_fp" -> FlatVisitSummary.whyNotOnFp,
    "tb_status" -> FlatVisitSummary.tbStatus,
    "side_effects" -> FlatVisitSummary.sideEffects,
    "patient_source" -> FlatVisitSummary.patientSource,
    "cur_arv_adherence" -> FlatVisitSummary.curArvAdherence,
    "who_stage" -> FlatVisitSummary.whoStage,
    "ctx_adherence" -> FlatVisitSummary.ctxAdherence,
    "ctx_dispensed" -> FlatVisitSummary.ctxDispensed,
    "inh_dispensed" -> FlatVisitSummary.inhDispensed,
    "other_medications_dispensed" -> FlatVisitSummary.otherMedsDispensed,
    "arvs_adherence" -> FlatVisitSummary.arvsAdherence,
    "why_arvs_adherence_poor" -> FlatVisitSummary.whyArvsAdherencePoor,
    "pmtct_ppct" -> FlatVisitSummary.pmtctPpct,
    "currentregmen" -> FlatVisitSummary.currentRegimen,
    "refferal_hospitalized" -> FlatVisitSummary.refferalHospitalized,
    "breastfing" -> FlatVisitSummary.breastfingMode,
    "at_risk_population" -> FlatVisitSummary.atRiskPopulation,
    "pwp_disclosure" -> FlatVisitSummary.pwpDisclosure,
    "pwp_partner_tested" -> FlatVisitSummary.pwpPartnerTested,
    "condoms_dispensed" -> FlatVisitSummary.condomsDispensed,
    "sti_screened" -> FlatVisitSummary.stiScreened)

  /** The 1271=<code> → Yes membership decodes (else "No"). */
  private val testDoneCodes: Map[String, Int] = Map(
    "cd4_cd4percentage" -> 5497, "Hgb" -> 21, "rpr_done" -> 1569,
    "tb_sputum_done" -> 1883, "other_test_done" -> 5622)

  private lazy val parsed: Map[String, Seq[(String, String)]] = {
    val text = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(RefPath)).asScala.mkString("\n")
    // arm:  when obs regexp "!!<c>=(<code>)!!" then @var:=<'|">label<'|">
    val arm = """(?s)when obs regexp "!!(\d+)=\(?(\d+)\)?!!"\s*then\s*@\w+\s*:=\s*(['"])(.*?)\3"""
      .r
    // block terminator:  end as <name>
    val endAs = """end as (\w+)""".r
    // walk blocks: split the file on "end as X" keeping preceding segment
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(String, String)]]
    var lastEnd = 0
    for (m <- endAs.findAllMatchIn(text)) {
      val segment = text.substring(lastEnd, m.start)
      lastEnd = m.end
      val arms = arm.findAllMatchIn(segment).map { am =>
        s"${am.group(1)}=${am.group(2)}" -> am.group(4)
      }.toSeq
      if (arms.nonEmpty) out(m.group(1)) = arms
    }
    out.toMap
  }

  test("every transcribed decode table matches the reference arms in order") {
    tables.foreach { case (refName, ours) =>
      val ref = parsed.getOrElse(refName, fail(s"no parsed arms for $refName"))
      assert(ours == ref,
        s"table $refName differs:\n ours=$ours\n ref =$ref")
    }
  }

  test("tests-ordered membership decodes match the reference codes") {
    testDoneCodes.foreach { case (refName, code) =>
      val ref = parsed.getOrElse(refName, fail(s"no parsed arms for $refName"))
      assert(ref == Seq(s"1271=$code" -> "Yes"),
        s"$refName: expected single arm 1271=$code -> Yes, got $ref")
    }
  }

  test("reference has no decode blocks we did not transcribe") {
    val known = tables.keySet ++ testDoneCodes.keySet
    val coded = parsed.keySet
    assert((coded -- known).isEmpty,
      s"untranscribed decode blocks: ${coded -- known}")
  }
}
