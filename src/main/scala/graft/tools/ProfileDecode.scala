package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.FlatVisitSummary

/** Decompose the q73 visit-summary cost: fixture construction vs the typed
  * decode projection vs the timestamp parses inside it. The fixture frame is
  * materialized to parquet once so each decode variant times ONLY its own
  * projection over identical input. Throwaway measurement harness (numbers
  * land in SCALE.md); not part of the library surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ProfileDecode
  */
object ProfileDecode {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-44s best ${ts.min}%6.2f  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
      ts.min
    }

    // Full catalog queries for reference.
    val q73 = graft.SparkEntry.catalog.find(_.name == "q73_visit_summary_typed").get
    val q56 = graft.SparkEntry.catalog.find(_.name == "q56_visit_summary_stage").get
    time("q73 full (fixture+decode)") { q73.run(spark, sfDir) }
    time("q56 full (fixture+decode, string)") { q56.run(spark, sfDir) }

    // Materialize the typed fixture (flat_obs w/ obs_entries) once.
    val fixDir = "/tmp/profile_decode_fixture"
    val fixture = graft.queries.EtlPipelineQueries.visitSummaryTypedInput(spark, sfDir)
    fixture.write.mode("overwrite").parquet(fixDir)
    val person = spark.read.parquet(s"$sfDir/customer.parquet").select(
      col("c_custkey").cast("int").as("person_id"), col("c_name").as("uuid"))
    person.write.mode("overwrite").parquet("/tmp/profile_decode_person")
    val flatObs = spark.read.parquet(fixDir)
    val personP = spark.read.parquet("/tmp/profile_decode_person")

    time("fixture build only -> noop") {
      graft.queries.EtlPipelineQueries.visitSummaryTypedInput(spark, sfDir)
    }
    time("read fixture -> noop (I/O floor)") { flatObs }
    time("read -> full stage (decode+join)") {
      FlatVisitSummary.build(flatObs, flatObs.limit(0), personP)
    }

    // Decode variants over the materialized fixture, no person join.
    val m = col("obs_entries")
    def variant(cols: Seq[Column]): DataFrame =
      flatObs.select(col("person_id") +: cols: _*)

    val full = FlatVisitSummary.decodeColumnsTyped(m)
    time("decode: all 35 typed columns") { variant(full) }

    time("decode: STAGED lookups + chains") {
      flatObs.select(col("person_id") +: FlatVisitSummary.typedLookupColumns(m): _*)
        .select(col("person_id") +: FlatVisitSummary.decodeColumnsFromLookups: _*)
    }

    time("decode: one-pass EXPRESSION") {
      flatObs.select(col("person_id"),
          graft.functions.ObsDecode.decodeAll(m).as("__dec"))
        .select(col("person_id") +: FlatVisitSummary.decodeColumnsFromStruct(col("__dec")): _*)
    }

    val noTs = full.filterNot { c =>
      val s = c.toString
      s.contains("enrollment_date") || s.contains("hiv_start_date") || s.contains("tca")
    }
    time("decode: minus 3 try_to_timestamp cols") { variant(noTs) }

    val tsOnly = full.filter { c =>
      val s = c.toString
      s.contains("enrollment_date") || s.contains("hiv_start_date") || s.contains("tca")
    }
    time("decode: ONLY 3 try_to_timestamp cols") { variant(tsOnly) }

    // Is the map lookup or the arm chain the cost? Lookup-only projection:
    val lookups = graft.queries.EtlPipelineQueries.profileConcepts
      .map(c => try_element_at(m, lit(c)).as(s"c$c"))
    time("decode: bare map lookups (one/concept)") { variant(lookups) }

    spark.stop()
  }
}
