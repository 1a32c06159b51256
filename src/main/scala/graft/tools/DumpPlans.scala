package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the FULL `.explain("formatted")` physical plan of selected
  * catalog queries to files — the round's before/after plan evidence
  * (`plans/r<n>/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <tag> <query> [query ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <tag> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
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
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val q = graft.SparkEntry.catalog.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      q.prepare.foreach(_(spark, sfDir))
      val plan = q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Reused"))
      val header =
        s"== $n  ($tag, $sfDir) ==\n" +
          s"== Exchange nodes (non-reused): $exchanges ==\n\n"
      java.nio.file.Files.write(outDir.resolve(s"${n}_$tag.txt"),
        (header + plan).getBytes("UTF-8"))
      println(s"[plans] wrote ${n}_$tag.txt ($exchanges exchanges)")
    }
    spark.stop()
  }
}
