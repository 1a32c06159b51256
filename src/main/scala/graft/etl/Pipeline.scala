package graft.etl

import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Watermark

/** The stage DAG runner: the five flat tables maintained as idempotent
  * incremental jobs over parquet, with the `flat_log` watermark store —
  * the Spark rebuild of the reference's cron-style `CALL` loop
  * (README.md:4-9; conceptually Structured Streaming Trigger.AvailableNow
  * done batch-side, SURVEY §2.9).
  *
  * Dependency order (SURVEY dependency graph):
  *   flat_obs, flat_orders, flat_lab_obs  (from openmrs sources)
  *   → flat_visit_summary                 (from flat_obs + flat_orders)
  *   → flat_latest_hiv_summary            (from flat_visit_summary)
  *
  * Each run: resolve watermark (flat_log → fallback → epoch) → incremental
  * update → atomic snapshot swap (write new dir, rename over old — the
  * REPLACE-INTO-equivalent sink; a production deployment would use a
  * Delta/Iceberg MERGE instead) → append run row to flat_log.
  */
class Pipeline(spark: SparkSession, root: String) {

  val flatObsVersion = "flat_obs_v1.0"
  val flatOrdersVersion = "flat_orders_v1.1" // §7.4.10 version drift, faithful
  val flatLabObsVersion = "flat_lab_obs_v1.3"
  val flatVisitSummaryVersion = "flat_visit_summary_v1.0"

  private def path(name: String) = s"$root/$name"
  private val logPath = path("flat_log")

  def readFlat(name: String): Option[DataFrame] = {
    val p = new Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path(name))) else None
  }

  /** Atomic snapshot swap: write to a temp dir, then rename into place.
    * Readers never observe a half-written table.
    */
  def writeSnapshot(df: DataFrame, name: String): Unit = {
    val target = new Path(path(name))
    val tmp = new Path(path(name) + ".tmp")
    val old = new Path(path(name) + ".old")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** The new watermark recorded after a run is the max source
    * `date_created` captured at run start (flat_obs_v1.0.sql:26-28,345:
    * `insert into flat_log values (@start, @last_date_created, …)`) — NOT
    * wall-clock, so source rows racing the run are re-read next tick.
    */
  private def maxTs(dfs: Seq[(DataFrame, String)]): Timestamp =
    dfs.flatMap { case (df, c) =>
      Option(df.agg(max(col(c)).cast("string")).first().getString(0))
        .map(Timestamp.valueOf)
    }.reduceOption((a, b) => if (a.after(b)) a else b).getOrElse(Watermark.Epoch)

  private def runStage(
      version: String,
      flatName: String,
      newWatermark: Timestamp,
      run: Timestamp => DataFrame): Unit = {
    val start = new Timestamp(System.currentTimeMillis())
    val log = Watermark.readLog(spark, logPath)
    val wm = Watermark.resolve(log, version, readFlat(flatName))
    val result = run(wm)
    writeSnapshot(result, flatName)
    val secs = ((System.currentTimeMillis() - start.getTime) / 1000).toShort
    Watermark.appendRun(spark, logPath, version, newWatermark, secs)
  }

  /** One full pipeline tick over the given source snapshot. */
  def tick(obs: DataFrame, encounter: DataFrame, orders: DataFrame, person: DataFrame): Unit = {
    val encObsMax = maxTs(Seq(encounter -> "date_created", obs -> "date_created"))
    runStage(flatObsVersion, "flat_obs", encObsMax, wm =>
      readFlat("flat_obs") match {
        case Some(existing) => FlatObs.incremental(existing, obs, encounter, person, wm)
        case None => FlatObs.build(obs, encounter, person)
      })
    runStage(flatOrdersVersion, "flat_orders",
      maxTs(Seq(orders -> "date_created")), wm =>
        readFlat("flat_orders") match {
          case Some(existing) => FlatOrders.incremental(existing, orders, encounter, person, wm)
          case None => FlatOrders.build(orders, encounter, person)
        })
    runStage(flatLabObsVersion, "flat_lab_obs", encObsMax, wm =>
      readFlat("flat_lab_obs") match {
        case Some(existing) => FlatLabObs.incremental(existing, obs, person, wm)
        case None => FlatLabObs.build(obs, person)
      })
    runStage(flatVisitSummaryVersion, "flat_visit_summary",
      maxTs(Seq(readFlat("flat_obs").get -> "max_date_created")), wm => {
        val fo = readFlat("flat_obs").get
        val ford = readFlat("flat_orders").get
        readFlat("flat_visit_summary") match {
          case Some(existing) =>
            FlatVisitSummary.incremental(existing, fo, ford, obs, encounter, person, wm)
          case None => FlatVisitSummary.build(fo, ford, person)
        }
      })
    writeSnapshot(
      FlatLatestHivSummary.build(readFlat("flat_visit_summary").get),
      "flat_latest_hiv_summary")
  }
}
