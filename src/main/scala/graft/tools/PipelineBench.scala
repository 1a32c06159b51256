package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline tick bench: a full five-stage build at t1, then an
  * incremental tick at t2 over a ~2% active-person delta, with the typed
  * obs path and the manifest-committed bucketed sinks on every
  * person-keyed stage — the configuration a production deployment would
  * run. Reports wall seconds per tick and per-stage bytes written (full
  * epoch vs delta epochs), proving the incremental write volume is
  * O(delta), not O(table). Every bucketed stage is hash-checked against
  * a from-scratch rebuild on the t2 sources before any number is
  * reported — a fast bench that drifted from the batch semantics would
  * be worse than no bench.
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
    val r = df.select(hash(cols.toIndexedSeq.map(col): _*).cast("long").as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("s")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  def run(spark: SparkSession): Seq[(String, Double)] = {
    val nPersons = sys.env.getOrElse("SPARK_GRAFT_TICK_PERSONS", "2000").toInt
    val salt = sys.env.getOrElse("SPARK_GRAFT_TICK_SALT", "0")
    // Bucket-count sizing is what makes the O(delta) write claim true:
    // an incremental epoch rewrites WHOLE touched buckets, so expected
    // write fraction ≈ 1 - exp(-deltaKeys/buckets) — buckets must exceed
    // the steady-state delta key count by ~10x for a ~10% bound. The old
    // fixed-256 setting silently broke that rule past ~5k persons (2%
    // delta = 400 keys touched 80% of 256 buckets) and benched a
    // near-full rewrite; a fixed 4096 obeys it but drowns the toy-scale
    // wall time in per-file costs (4096 near-empty parquet files per
    // stage — measured 23s -> 89s full build at 2000 persons). The
    // default applies the rule to THIS fixture's 2% delta:
    // buckets = persons/5 = 10x the expected delta keys.
    val buckets = sys.env.getOrElse("SPARK_GRAFT_TICK_BUCKETS",
      math.max(64, nPersons / 5).toString)
    val root = java.nio.file.Files.createTempDirectory("graft-tickbench")
    val prevConf = Seq("graft.etl.typedObs", "graft.sink.buckets",
      graft.etl.FlatObs.SaltConfKey).map(k => k -> spark.conf.getOption(k))
    try {
      // typed obs is the pipeline default; SPARK_GRAFT_TICK_TYPED=0
      // benches the string-only fidelity mode for the A/B record
      spark.conf.set("graft.etl.typedObs",
        (sys.env.getOrElse("SPARK_GRAFT_TICK_TYPED", "1") == "1").toString)
      spark.conf.set("graft.sink.buckets", buckets)
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

      val bucketed = Seq("flat_obs", "flat_orders", "flat_lab_obs",
        "flat_visit_summary")
      def bucketsDir(name: String) = root.resolve(name).resolve("buckets")
      val fullBytes = bucketed.map(n => n -> dirBytes(bucketsDir(n).resolve("e_0"))).toMap

      val (obs2, enc2, ord2, _) = views(t2)
      val s2 = System.nanoTime()
      pipe.tick(obs2, enc2, ord2, person)
      val tickIncr = (System.nanoTime() - s2) / 1e9
      val incrBytes = bucketed.map(n =>
        n -> (dirBytes(bucketsDir(n)) - fullBytes(n))).toMap

      // gate: every bucketed stage's incremental == a from-scratch
      // rebuild at t2 — a fast bench that drifted from the batch
      // semantics would be worse than no bench
      import graft.etl.{FlatLabObs, FlatObs, FlatOrders, FlatVisitSummary}
      val rebuilds: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
        "flat_obs" -> (() => FlatObs.build(obs2, enc2, person)),
        "flat_orders" -> (() => FlatOrders.build(ord2, enc2, person)),
        "flat_lab_obs" -> (() => FlatLabObs.build(obs2, person)),
        "flat_visit_summary" -> (() => FlatVisitSummary.build(
          FlatObs.build(obs2, enc2, person),
          FlatOrders.build(ord2, enc2, person), person)))
      bucketed.foreach { n =>
        val got = signature(
          graft.operators.BucketedSink.read(spark, bucketsDir(n).toString))
        val want = signature(rebuilds(n)())
        require(got == want, s"$n equivalence failed: bucketed=$got rebuild=$want")
      }

      Seq(obs1, enc1, ord1, obs2, enc2, ord2, person).foreach(_.unpersist())
      Seq(
        "full_build_sec" -> tickFull,
        "incr_tick_sec" -> tickIncr,
        "n_persons" -> nPersons.toDouble) ++
        bucketed.flatMap { n =>
          Seq(
            s"${n}_full_bytes" -> fullBytes(n).toDouble,
            s"${n}_incr_bytes" -> incrBytes(n).toDouble,
            s"${n}_incr_fraction" ->
              (if (fullBytes(n) > 0) incrBytes(n).toDouble / fullBytes(n)
               else 0.0))
        }
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
