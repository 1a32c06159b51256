package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline tick bench: a full five-stage build at t1, then an
  * incremental tick at t2 over a ~3% delta, with the typed obs path and
  * the manifest-committed bucketed flat_obs sink on — the configuration a
  * production deployment would run. Reports wall seconds per tick and
  * flat_obs bytes written (full epoch vs delta epochs), proving the
  * incremental write volume is O(delta), not O(table). The incremental
  * result is hash-checked against a from-scratch rebuild on the t2
  * sources before any number is reported — a fast bench that drifted
  * from the batch semantics would be worse than no bench.
  *
  * Standalone: `runMain graft.tools.PipelineBench`; also folded into
  * `graft.Bench`'s JSON as the "tick" object (SPARK_GRAFT_TICK=0 skips).
  */
object PipelineBench {

  private def dirBytes(p: java.nio.file.Path): Long =
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }

  /** count + order-independent content hash, typed column excluded (maps
    * don't hash; the string obs columns cover the same content). */
  private def signature(df: DataFrame): (Long, Long) = {
    val cols = df.columns.filter(_ != "obs_entries").sorted
    val r = df.select(hash(cols.map(col): _*).cast("long").as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("s")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  def run(spark: SparkSession): Seq[(String, Double)] = {
    val nPersons = sys.env.getOrElse("SPARK_GRAFT_TICK_PERSONS", "2000").toInt
    val salt = sys.env.getOrElse("SPARK_GRAFT_TICK_SALT", "0")
    val root = java.nio.file.Files.createTempDirectory("graft-tickbench")
    val prevConf = Seq("graft.etl.typedObs", "graft.sink.buckets",
      graft.etl.FlatObs.SaltConfKey).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("graft.etl.typedObs", "true")
      spark.conf.set("graft.sink.buckets", "256")
      if (salt != "0") spark.conf.set(graft.etl.FlatObs.SaltConfKey, salt)

      val src = BenchFixtures.sources(spark, nPersons)
      val t1 = BenchFixtures.asOf(60)
      val t2 = BenchFixtures.asOf(90)
      def views(t: java.sql.Timestamp) = (
        BenchFixtures.obsAsOf(src("obs"), t).cache(),
        BenchFixtures.encAsOf(src("encounter"), t).cache(),
        BenchFixtures.ordersAsOf(src("orders"), t).cache(),
        src("person").cache())

      val pipe = new graft.etl.Pipeline(spark, root.toString)
      val (obs1, enc1, ord1, person) = views(t1)
      val s1 = System.nanoTime()
      pipe.tick(obs1, enc1, ord1, person)
      val tickFull = (System.nanoTime() - s1) / 1e9

      val bucketsDir = root.resolve("flat_obs").resolve("buckets")
      val visitDir = root.resolve("flat_visit_summary").resolve("buckets")
      val fullBytes = dirBytes(bucketsDir.resolve("e_0"))
      val fullVisitBytes = dirBytes(visitDir.resolve("e_0"))

      val (obs2, enc2, ord2, _) = views(t2)
      val s2 = System.nanoTime()
      pipe.tick(obs2, enc2, ord2, person)
      val tickIncr = (System.nanoTime() - s2) / 1e9
      val incrBytes = dirBytes(bucketsDir) - fullBytes
      val incrVisitBytes = dirBytes(visitDir) - fullVisitBytes

      // gate: incremental-through-buckets == from-scratch rebuild at t2,
      // for both bucketed stages
      val got = signature(
        graft.operators.BucketedSink.read(spark, bucketsDir.toString))
      val want = signature(graft.etl.FlatObs.build(obs2, enc2, person))
      require(got == want,
        s"tick bench equivalence failed: bucketed=$got rebuild=$want")
      val gotVisit = signature(
        graft.operators.BucketedSink.read(spark, visitDir.toString))
      val wantVisit = signature(graft.etl.FlatVisitSummary.build(
        graft.etl.FlatObs.build(obs2, enc2, person),
        graft.etl.FlatOrders.build(ord2, enc2, person), person))
      require(gotVisit == wantVisit,
        s"visit summary equivalence failed: bucketed=$gotVisit rebuild=$wantVisit")

      Seq(obs1, enc1, ord1, obs2, enc2, ord2, person).foreach(_.unpersist())
      Seq(
        "full_build_sec" -> tickFull,
        "incr_tick_sec" -> tickIncr,
        "flat_obs_full_bytes" -> fullBytes.toDouble,
        "flat_obs_incr_bytes" -> incrBytes.toDouble,
        "incr_write_fraction" ->
          (if (fullBytes > 0) incrBytes.toDouble / fullBytes else 0.0),
        "visit_full_bytes" -> fullVisitBytes.toDouble,
        "visit_incr_bytes" -> incrVisitBytes.toDouble,
        "visit_incr_write_fraction" ->
          (if (fullVisitBytes > 0) incrVisitBytes.toDouble / fullVisitBytes
           else 0.0),
        "n_persons" -> nPersons.toDouble)
    } finally {
      prevConf.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      // best-effort temp cleanup
      try {
        val s = java.nio.file.Files.walk(root)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally s.close()
      } catch { case _: Throwable => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = run(spark)
    println(m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
