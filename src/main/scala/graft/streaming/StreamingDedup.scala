package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{Cluster, Dedup, TextAnalysis}

/** Streaming near-dup detection against an ever-growing corpus — the
  * Structured Streaming twin of `Dedup.lshCandidatePairsIncremental`
  * (q74): each micro-batch of newly ingested documents is shingled,
  * minhashed, banded, and joined against the PERSISTED band index of
  * everything committed before it; verified pairs and the batch's own
  * bands/shingles are staged, then committed. Per-batch cost scales
  * with |batch| x bands joined against the index — never with corpus²,
  * and the corpus index is only ever appended to, never recomputed.
  *
  * The index is two parquet tables: `bands/` (id, band, bkey — candidate
  * generation) and `shingles/` (id, shingle — exact-Jaccard verify).
  * Storing verify-side shingles keeps the loop self-contained; a
  * production variant could instead re-fetch the two documents' text at
  * verify time and keep only the (much smaller) band index hot.
  *
  * Delivery is EXACTLY-ONCE end-to-end, the same manifest-commit trick
  * as `BucketedSink`: every output lands in per-batch staging
  * directories (`pairsDir/b_<id>`, `bands/b_<id>`, `shingles/b_<id>`,
  * written with overwrite so a rerun replaces a crashed attempt's
  * partial files), and the single commit point is an atomic rename of
  * the `_COMMITTED` batch-id manifest under `indexDir` — covering all
  * three sinks at once. Readers ([[readPairs]]/[[readBands]]/
  * [[readShingles]] and the candidate join itself) resolve ONLY
  * committed batches, so a batch retried after any mid-write crash sees
  * the exact pre-batch index its first attempt saw, rewrites its
  * staging dirs wholesale, and commits once; a batch redelivered after
  * a successful commit is skipped outright. Structured Streaming's
  * checkpointed batch ids are the idempotence key — a direct-call
  * backfill loop owns the same uniqueness contract.
  */
object StreamingDedup {

  private def committedFile(indexDir: String) = new Path(indexDir, "_COMMITTED")

  /** Batch ids whose outputs are committed — the only ones readers see. */
  def committedBatches(conf: Configuration, indexDir: String): Seq[Long] = {
    val p = committedFile(indexDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        new String(buf.toByteArray, StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty).map(_.toLong).toSeq.sorted
      } finally in.close()
    }
  }

  /** Single atomic commit point: rewrite the manifest via tmp + rename
    * (OVERWRITE) — one rename, no window where the file is absent. */
  private def commit(conf: Configuration, indexDir: String, ids: Seq[Long]): Unit = {
    val dir = new Path(indexDir)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new Path(dir, "_COMMITTED.tmp")
    val out = fs.create(tmp, true)
    try out.write(ids.distinct.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(dir.toUri, conf)
      .rename(tmp, committedFile(indexDir), Options.Rename.OVERWRITE)
  }

  private def batchDirs(base: Path, ids: Seq[Long]): Seq[String] =
    ids.sorted.map(i => new Path(base, s"b_$i").toString)

  private def readCommitted(
      spark: SparkSession, indexDir: String, base: Path,
      emptySchema: String): DataFrame = {
    val ids = committedBatches(
      spark.sparkContext.hadoopConfiguration, indexDir)
    // before the first micro-batch commits there is no parquet to carry a
    // schema — a monitoring reader racing the stream start sees an empty
    // frame with the declared schema, not a crash
    if (ids.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(emptySchema))
    else spark.read.parquet(batchDirs(base, ids): _*)
  }

  /** All committed verified pairs (id_a, id_b, jaccard). */
  def readPairs(spark: SparkSession, indexDir: String, pairsDir: String): DataFrame =
    readCommitted(spark, indexDir, new Path(pairsDir),
      "id_a BIGINT, id_b BIGINT, jaccard DOUBLE")

  /** The committed band index (id, band, bkey). */
  def readBands(spark: SparkSession, indexDir: String): DataFrame =
    readCommitted(spark, indexDir, new Path(indexDir, "bands"),
      "id BIGINT, band INT, bkey STRING")

  /** The committed shingle store (id, shingle). */
  def readShingles(spark: SparkSession, indexDir: String): DataFrame =
    readCommitted(spark, indexDir, new Path(indexDir, "shingles"),
      "id BIGINT, shingle STRING")

  private def clusterUpdates(
      spark: SparkSession, indexDir: String, ids: Seq[Long]): DataFrame = {
    val base = new Path(indexDir, "clusters")
    if (ids.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType
          .fromDDL("id BIGINT, cluster BIGINT, batch_id BIGINT"))
    else spark.read.parquet(batchDirs(base, ids): _*)
  }

  /** Current per-document cluster assignment, maintained INCREMENTALLY
    * (q160's contraction, [[Cluster.incrementalComponents]]): each batch
    * stages only the assignment rows its pairs changed — absorbed
    * clusters' members and first-seen docs — and the live view is the
    * last-wins fold of the committed update log by batch id. Re-running
    * global CC over the accumulated pair log every micro-batch would be
    * the O(history) re-pay this module exists to avoid; with the
    * update-log form, per-batch cluster cost is O(batch pairs + absorbed
    * members). The fold's window is over the update log — compact it
    * like any keyed log when it outgrows the assignment itself. */
  def readClusters(spark: SparkSession, indexDir: String): DataFrame = {
    val ids = committedBatches(
      spark.sparkContext.hadoopConfiguration, indexDir)
    clusterUpdates(spark, indexDir, ids)
      .withColumn("rn", row_number()
        .over(Window.partitionBy("id").orderBy(col("batch_id").desc)))
      .filter(col("rn") === 1)
      .select(col("id"), col("cluster"),
        (col("id") === col("cluster")).as("is_canonical"))
  }

  /** Shingle + band one frame of (doc_id, text). */
  private def prep(docs: DataFrame, shingleN: Int, k: Int, rowsPerBand: Int)
      : (DataFrame, DataFrame) = {
    val shingles = docs
      .select(col("doc_id").as("id"),
        explode(TextAnalysis.shingles(
          TextAnalysis.words(TextAnalysis.normalize(col("text"))), shingleN))
          .as("shingle"))
      .distinct()
    (shingles, Dedup.minhashBands(shingles, k, rowsPerBand))
  }

  /** Start the ingest loop over a streaming frame of (doc_id, text).
    * Emits verified pairs (id_a, id_b, jaccard >= threshold) under
    * `pairsDir`; maintains the band/shingle index under `indexDir`.
    * Caller owns doc_id uniqueness across the stream's lifetime.
    */
  def start(
      docsStream: DataFrame,
      indexDir: String,
      pairsDir: String,
      checkpointDir: String,
      shingleN: Int = 3,
      k: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, indexDir, pairsDir,
          shingleN, k, rowsPerBand, threshold)
      }
      .start()

  /** One micro-batch: candidates vs the committed index + new-vs-new,
    * verify, stage outputs, commit atomically. Also the unit a batch
    * backfill calls directly in a loop (with caller-unique batch ids).
    * Idempotent per batch id: a redelivery after commit is a no-op, a
    * retry after a mid-write crash overwrites the staging dirs and
    * commits once.
    */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      indexDir: String,
      pairsDir: String,
      shingleN: Int,
      k: Int,
      rowsPerBand: Int,
      threshold: Double): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val done = committedBatches(conf, indexDir)
    if (done.contains(batchId)) return // redelivered after commit
    // the batch frame re-evaluates per action and is consumed by three
    // (pairs, bands staging, shingles staging) — materialize it once
    val (newShingles, newBands) =
      prep(batch.select("doc_id", "text"), shingleN, k, rowsPerBand)
    newShingles.cache(); newBands.cache()
    try {
      val bandsBase = new Path(indexDir, "bands")
      val shinglesBase = new Path(indexDir, "shingles")

      val candidates =
        if (done.nonEmpty)
          Dedup.lshCandidatePairsIncremental(
            spark.read.parquet(batchDirs(bandsBase, done): _*), newBands)
        else Dedup.lshCandidatePairs(newBands)
      // verify joins need both sides' shingles: committed ∪ this batch
      val allShingles =
        if (done.nonEmpty)
          spark.read.parquet(batchDirs(shinglesBase, done): _*)
            .unionByName(newShingles)
        else newShingles

      // stage all four outputs under this batch's own dirs; overwrite
      // replaces whatever a crashed earlier attempt left behind
      val pairsPath = new Path(pairsDir, s"b_$batchId").toString
      Dedup.jaccardVerify(allShingles, candidates)
        .filter(col("jaccard") >= threshold)
        .write.mode("overwrite")
        .parquet(pairsPath)
      newBands.write.mode("overwrite")
        .parquet(new Path(bandsBase, s"b_$batchId").toString)
      newShingles.write.mode("overwrite")
        .parquet(new Path(shinglesBase, s"b_$batchId").toString)
      // O(delta) cluster maintenance: contract prior components to their
      // labels (committed fold only — a retry recomputes against the
      // exact pre-batch assignment its first attempt saw), run CC on
      // this batch's pairs over the contracted graph, stage just the
      // changed assignment rows. The staged pairs are read back rather
      // than re-deriving the verify pipeline a second time.
      val prevAssign = clusterUpdates(spark, indexDir, done)
        .withColumn("rn", row_number()
          .over(Window.partitionBy("id").orderBy(col("batch_id").desc)))
        .filter(col("rn") === 1)
        .select(col("id"), col("cluster"))
      Cluster.incrementalComponents(
          prevAssign, spark.read.parquet(pairsPath))
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .parquet(new Path(indexDir, "clusters") + s"/b_$batchId")

      commit(conf, indexDir, done :+ batchId) // the one atomic step
    } finally {
      newShingles.unpersist(); newBands.unpersist()
    }
  }
}
