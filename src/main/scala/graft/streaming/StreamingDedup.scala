package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{Dedup, TextAnalysis}

/** Streaming near-dup detection against an ever-growing corpus — the
  * Structured Streaming twin of `Dedup.lshCandidatePairsIncremental`
  * (q74): each micro-batch of newly ingested documents is shingled,
  * minhashed, banded, and joined against the PERSISTED band index of
  * everything ingested before it; verified pairs are appended to the
  * output and the batch's own bands/shingles are appended to the index.
  * Per-batch cost scales with |batch| x bands joined against the index —
  * never with corpus², and the corpus index is only ever appended to,
  * never recomputed.
  *
  * The index is two parquet tables: `bands/` (id, band, bkey — candidate
  * generation) and `shingles/` (id, shingle — exact-Jaccard verify).
  * Storing verify-side shingles keeps the loop self-contained; a
  * production variant could instead re-fetch the two documents' text at
  * verify time and keep only the (much smaller) band index hot.
  *
  * Delivery: checkpointed offsets make ingestion at-least-once; a batch
  * retried after a crash mid-append can duplicate pairs/index rows (plain
  * parquet append is not transactional). Idempotence needs a
  * MERGE-capable sink keyed on (id_a, id_b) / (id, band); on plain
  * parquet, dedup on read. Each pair is otherwise emitted exactly once —
  * in the batch where its LATER document arrives.
  */
object StreamingDedup {

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
    * Emits verified pairs (id_a, id_b, jaccard >= threshold) to
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, indexDir, pairsDir, shingleN, k, rowsPerBand, threshold)
      }
      .start()

  /** One micro-batch: candidates vs the pre-batch index + new-vs-new,
    * verify, append outputs, then grow the index. Also the unit a batch
    * backfill calls directly in a loop.
    */
  def ingestBatch(
      batch: DataFrame,
      indexDir: String,
      pairsDir: String,
      shingleN: Int,
      k: Int,
      rowsPerBand: Int,
      threshold: Double): Unit = {
    val spark = batch.sparkSession
    // the batch frame re-evaluates per action and is consumed by three
    // (pairs, bands append, shingles append) — materialize it once
    val (newShingles, newBands) =
      prep(batch.select("doc_id", "text"), shingleN, k, rowsPerBand)
    newShingles.cache(); newBands.cache()
    try {
      val bandsPath = new Path(indexDir, "bands").toString
      val shinglesPath = new Path(indexDir, "shingles").toString
      val fs = new Path(indexDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val hasIndex = fs.exists(new Path(bandsPath))

      val candidates =
        if (hasIndex)
          Dedup.lshCandidatePairsIncremental(
            spark.read.parquet(bandsPath), newBands)
        else Dedup.lshCandidatePairs(newBands)
      // verify joins need both sides' shingles: stored ∪ this batch
      val allShingles =
        if (hasIndex) spark.read.parquet(shinglesPath).unionByName(newShingles)
        else newShingles
      Dedup.jaccardVerify(allShingles, candidates)
        .filter(col("jaccard") >= threshold)
        .write.mode("append").parquet(pairsDir)

      newBands.write.mode("append").parquet(bandsPath)
      newShingles.write.mode("append").parquet(shinglesPath)
    } finally {
      newShingles.unpersist(); newBands.unpersist()
    }
  }
}
