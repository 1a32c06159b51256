package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Super-linearity probe above the graded decade (round-10 verdict #7):
  * the 100 TB arguments are by-construction; ONE measured check above
  * sf0.1 catches a hidden O(n^2) the way q155's once was.
  *
  * Real testdata stops at sf0.1, so the probe UPSAMPLES it
  * deterministically — k relationally-consistent replicas with key
  * offsets (orders/lineitem follow their customer/order replicas;
  * part/supplier/region/nation stay dimensions), documents with a
  * per-replica text suffix (no accidental exact dups), embeddings with
  * a per-replica deterministic perturbation (no degenerate identical
  * vectors). Probe data only — correctness stays gated on the driver's
  * parquet.
  *
  * Runs each family leader at 1x/2x/4x (best of `SPARK_GRAFT_REPS`,
  * default 2) and prints the slope table for SCALE.md: t(2x)/t(1x) and
  * t(4x)/t(2x) per query — a healthy family doubles work when data
  * doubles (ratio ~<= 2.3 with fixed overheads); a ratio near 4 on a
  * doubling is the super-linear flag.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ScaleProbe
  *
  * `SPARK_GRAFT_SCALES` overrides the ladder (round-12 ask #5: one more
  * doubling for the steepest families, e.g. SPARK_GRAFT_SCALES=1,2,4,8
  * with the q55/q73/q129 leaders as args — distinguishing "linear with
  * constants" from "n log n creeping" needs the extra point).
  */
object ScaleProbe {

  private val DefaultQueries = Seq(
    // the five ETL stages
    "q43_flat_obs_stage", "q54_flat_orders_stage", "q55_flat_lab_obs_stage",
    "q73_visit_summary_typed", "q44_latest_summary_stage",
    // dedup leaders
    "q34_dedup_minhash_lsh", "q57_dedup_lsh_verified",
    "q129_suffix_array_dedup",
    // ANN leaders
    "q82_ann_ivfpq", "q85_ann_ivfpq_rerank")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val queries = if (args.nonEmpty) args.toSeq else DefaultQueries
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val dirs = scales.map(k => k -> prepare(spark, baseDir, k)).toMap
    val results = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (k <- scales; name <- queries) {
      val q = graft.SparkEntry.catalog.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      q.prepare.foreach(_(spark, dirs(k)))
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, dirs(k)).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      results((name, k)) = best
      println(f"[probe] ${k}x $name%-28s $best%7.2f s")
    }
    println("\n==== scale probe (best-of-" + reps + ") ====")
    val ratioHdr = scales.sliding(2).map {
      case Seq(a, b) => f"${s"${b}x/${a}x"}%7s"
      case _ => ""
    }.mkString
    println(f"${"query"}%-28s" +
      scales.map(k => f"${s"${k}x"}%8s").mkString + "  " + ratioHdr)
    queries.foreach { name =>
      val ts = scales.map(k => results((name, k)))
      val ratios = ts.sliding(2).map {
        case Seq(a, b) => f"${b / a}%7.2f"
        case _ => ""
      }.mkString
      println(f"$name%-28s" + ts.map(t => f"$t%8.2f").mkString + "  " + ratios)
    }
    spark.stop()
  }

  /** Build (once per run) the k-times-upsampled sf dir. */
  private def prepare(spark: SparkSession, baseDir: String, k: Int): String = {
    if (k == 1) return baseDir
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft-scaleprobe-x$k")
    if (java.nio.file.Files.exists(out.resolve("_DONE")))
      return out.toString
    def load(t: String): DataFrame =
      spark.read.parquet(s"$baseDir/$t.parquet")
    def save(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(out.resolve(s"$t.parquet").toString)
    // copies: pure dimensions
    Seq("region", "nation", "part", "supplier").foreach(t => save(load(t), t))
    val reps = spark.range(k).select(col("id").cast("int").as("__r"))
    def offsets(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))
    val ckMax = load("customer").agg(max("c_custkey")).first().getLong(0) + 1
    val okMax = load("orders").agg(max("o_orderkey")).first().getLong(0) + 1
    save(offsets(load("customer"))
      .withColumn("c_custkey", col("c_custkey") + col("__r") * ckMax)
      .drop("__r"), "customer")
    save(offsets(load("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("__r") * okMax)
      .withColumn("o_custkey", col("o_custkey") + col("__r") * ckMax)
      .drop("__r"), "orders")
    save(offsets(load("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("__r") * okMax)
      .drop("__r"), "lineitem")
    val docMax = load("documents").agg(max("doc_id")).first().getLong(0) + 1
    save(offsets(load("documents"))
      .withColumn("doc_id", col("doc_id") + col("__r") * docMax)
      .withColumn("text",
        when(col("__r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" r"), col("__r"))))
      .drop("__r"), "documents")
    val vecMax = load("embeddings").agg(max("vec_id")).first().getLong(0) + 1
    save(offsets(load("embeddings"))
      .withColumn("vec_id", col("vec_id") + col("__r") * vecMax)
      .withColumn("embedding",
        when(col("__r") === 0, col("embedding")).otherwise(
          // deterministic per-replica tilt: scale a few coordinates so
          // replicas are near but never identical
          transform(col("embedding"), (v, j) =>
            v * (lit(1.0f) + col("__r").cast("float") * lit(0.003f) *
              (pmod(j, lit(7)).cast("float") - lit(3.0f))))))
      .drop("__r"), "embeddings")
    java.nio.file.Files.createFile(out.resolve("_DONE"))
    out.toString
  }
}
