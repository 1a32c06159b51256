package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual catalog queries through the noop sink (same forcing as
  * Bench), best-of-N — for isolating one query's cost while iterating.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.TimeQuery q56_... [q...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val q = graft.SparkEntry.catalog.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      q.prepare.foreach(_(spark, sfDir)) // untimed fixture prep, as in Bench
      val times = (1 to reps).map { _ =>
        // same off-clock between-reps hygiene as Bench: every rep
        // computes from the parquet inputs, no cache carried rep-to-rep
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-32s best ${times.min}%6.2f  runs ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
