package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Profile the streaming catalog queries' micro-batch anatomy: per-batch
  * durationMs breakdown (addBatch / getBatch / commitOffsets /
  * walCommit) and state-store metrics, via a StreamingQueryListener —
  * the Spark-UI view of where a micro-batch's wall time goes, printed.
  *
  * Usage: runMain graft.tools.ProfileStream [q100|q89|q90]
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q100")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
          s"durations=${p.durationMs} " +
          p.stateOperators.map(s =>
            s"state(rows=${s.numRowsTotal}, mem=${s.memoryUsedBytes}, " +
              s"commitMs=${s.commitTimeMs})").mkString(" "))
      }
    })
    val name = which match {
      case "q100" => "q100_stream_stream_join"
      case "q89" => "q89_stream_windowed_counts"
      case "q90" => "q90_stream_sessionize"
      case other => other
    }
    val q = graft.SparkEntry.catalog.find(_.name == name).get
    q.prepare.foreach(_(spark, sfDir))
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[total] run $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
