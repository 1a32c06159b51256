package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q94's streamed cascade: where do the ~25 s go?
  * Replays EtlPipelineQueries.streamedCascade with a stopwatch around
  * each chunk write and each micro-batch cascade run, so the next
  * optimization targets the real cost, not a guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileCascade
  */
object ProfileCascade {
  def main(args: Array[String]): Unit = {
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
    spark.conf.set("graft.debug.cascadeTiming", "true")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val (obsRaw, encounter, orderRows, person) =
      graft.queries.EtlPipelineQueries.cascadeInputs(spark, sfDir)
    val obs = obsRaw.cache()
    t("materialize uniquified obs") { obs.count() }
    val root = java.nio.file.Files.createTempDirectory("graft-profq94")
    val obsDir = root.resolve("obs").toString
    val pipe = new graft.etl.Pipeline(spark, root.resolve("tables").toString)
    val cuts = Seq(("1000-01-01", "1995-01-01"),
      ("1995-01-01", "1997-01-01"), ("1997-01-01", "3000-01-01"))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      t(s"chunk $i write") {
        obs.filter(col("date_created") >= lit(lo) &&
            col("date_created") < lit(hi))
          .write.mode("overwrite").parquet(s"$obsDir/chunk_$i")
      }
      t(s"cascade run $i") {
        graft.streaming.IncrementalEtlStream.runCascadeOnce(
          spark, obsDir, encounter, orderRows, person, pipe,
          root.resolve("ckpt").toString)
      }
    }
    obs.unpersist()
    spark.stop()
  }
}
