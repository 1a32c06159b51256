package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the salted obs-aggregation path on the skew SURVEY §4 names:
  * one hot patient whose person-day group holds ~1.5M obs while everyone
  * else holds a handful. Unsalted, the sorted collect for that group
  * lands on ONE reducer — that task receives the whole group's rows and
  * its aggregation buffer holds them all; salted
  * (graft.skew.obsAggSaltBuckets=16) phase-1 spreads the receive over 16
  * reducers with 16× smaller buffers, and phase-2 merges the sorted
  * partials.
  *
  * MEASURED FINDING (recorded in SCALE.md): Spark already two-phases
  * this aggregation. collect_list runs as ObjectHashAggregate with a
  * map-side PARTIAL mode, so each map task ships one partial array per
  * key and the hot reducer receives ~tens of partial records, not 1.5M
  * rows — max shuffle-read records/bytes per task and wall-clock all
  * come out FLAT-to-worse under salting (phase-2 must still merge the
  * whole key, plus an extra shuffle). The classic salted-agg pattern is
  * redundant with Catalyst's partial aggregation for this operator; the
  * flag stays as a correctness-proven escape hatch (SaltedObsAggSpec)
  * for shapes where partial aggregation is unavailable, with salt=0 the
  * measured recommendation.
  */
object SkewBench {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Tracks the largest per-task shuffle read (records) across all
    * stages of whatever runs while registered. */
  private class MaxShuffleRead extends org.apache.spark.scheduler.SparkListener {
    val max = new java.util.concurrent.atomic.AtomicLong(0)
    val maxBytes = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      Option(te.taskMetrics).foreach { m =>
        val r = m.shuffleReadMetrics.recordsRead
        val b = m.shuffleReadMetrics.localBytesRead +
          m.shuffleReadMetrics.remoteBytesRead
        max.updateAndGet(c => math.max(c, r))
        maxBytes.updateAndGet(c => math.max(c, b))
      }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val nHot = sys.env.getOrElse("SPARK_GRAFT_SKEW_HOT", "1500000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // background: 2000 persons, ~64k obs; hot: person 1 with one
    // encounter-less person-day group of nHot obs (the skewed agg key)
    val src = BenchFixtures.sources(spark, 2000, encPerPerson = 4, obsPerEnc = 4)
    val hot = spark.range(1, nHot + 1L).select(
      (lit(10000000L) + col("id")).cast("int").as("obs_id"),
      lit(1).as("person_id"),
      lit(null).cast("int").as("encounter_id"),
      lit(9002).as("concept_id"),
      BenchFixtures.dayTs(lit(5), 8).as("obs_datetime"),
      lit(null).cast("int").as("value_coded"),
      lit(null).cast("double").as("value_numeric"),
      lit(null).cast("timestamp").as("value_datetime"),
      lit(null).cast("int").as("value_boolean"),
      format_string("hot-note-%09d", col("id")).as("value_text"),
      lit(null).cast("int").as("value_drug"),
      lit(null).cast("string").as("value_modifier"),
      BenchFixtures.dayTs(lit(5), 12).as("date_created"),
      lit(0).as("voided"),
      lit(null).cast("timestamp").as("date_voided"))
    val obs = src("obs").unionByName(hot).cache()
    val enc = src("encounter").cache()
    val person = src("person").cache()
    obs.count(); enc.count() // materialize the cache outside the timings

    def timed(salt: Int): (Double, Long, Long) = {
      if (salt > 0) spark.conf.set(graft.etl.FlatObs.SaltConfKey, salt.toString)
      else spark.conf.unset(graft.etl.FlatObs.SaltConfKey)
      val listener = new MaxShuffleRead
      spark.sparkContext.addSparkListener(listener)
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force(graft.etl.FlatObs.build(obs, enc, person))
        (System.nanoTime() - t0) / 1e9
      }.min
      Thread.sleep(1000) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      (best, listener.max.get(), listener.maxBytes.get())
    }

    def sig(salt: Int): (Long, Long) = {
      if (salt > 0) spark.conf.set(graft.etl.FlatObs.SaltConfKey, salt.toString)
      else spark.conf.unset(graft.etl.FlatObs.SaltConfKey)
      val df = graft.etl.FlatObs.build(obs, enc, person)
      val r = df.select(hash(df.columns.sorted.toIndexedSeq.map(col): _*).cast("long").as("h"))
        .agg(count(lit(1)), sum(col("h"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val (t0, rec0, by0) = timed(0)
    val (t16, rec16, by16) = timed(16)
    require(sig(0) == sig(16), "salted output != unsalted output")
    spark.conf.unset(graft.etl.FlatObs.SaltConfKey)
    println(f"""{"skew_hot_rows":$nHot,"unsalted_sec":$t0%.2f,"salted16_sec":$t16%.2f,"unsalted_max_task_records":$rec0,"salted16_max_task_records":$rec16,"unsalted_max_task_bytes":$by0,"salted16_max_task_bytes":$by16}""")
    spark.stop()
  }
}
