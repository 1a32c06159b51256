package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSuite
import graft.operators.{Dedup, TextAnalysis}

class StreamingDedupSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed chunked ingest emits exactly the full-corpus LSH pairs") {
    val root = Files.createTempDirectory("graft-streamdedup")
    val docsDir = root.resolve("docs").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // three arrival chunks, one file each — maxFilesPerTrigger=1 makes
    // each a separate micro-batch against the index grown so far
    (0 to 2).foreach { c =>
      docs.filter(pmod(col("doc_id"), lit(3)) === c).coalesce(1)
        .write.mode("append").parquet(docsDir)
    }

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(docsDir)
    val q = StreamingDedup.start(
      stream,
      indexDir = root.resolve("index").toString,
      pairsDir = root.resolve("pairs").toString,
      checkpointDir = root.resolve("ckpt").toString,
      trigger = Trigger.AvailableNow())
    assert(q.awaitTermination(300000), "stream did not drain in time")

    val got = spark.read.parquet(root.resolve("pairs").toString)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // batch reference: the q57 composition over the whole corpus
    val shingles = docs.select(col("doc_id").as("id"),
        explode(TextAnalysis.shingles(
          TextAnalysis.words(TextAnalysis.normalize(col("text"))), 3)).as("shingle"))
      .distinct().cache()
    val want = Dedup.jaccardVerify(shingles,
        Dedup.lshCandidatePairs(Dedup.minhashBands(shingles, 8, 2)))
      .filter(col("jaccard") >= 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)

    // the grown band index equals the full-corpus bands (same rows, no
    // duplicates) — the invariant that keeps batch N+1's cost O(batch)
    val gotBands = spark.read.parquet(root.resolve("index").resolve("bands").toString)
      .select("id", "band", "bkey").collect().map(_.toString).sorted.toSeq
    val wantBands = Dedup.minhashBands(shingles, 8, 2)
      .select("id", "band", "bkey").collect().map(_.toString).sorted.toSeq
    assert(gotBands == wantBands)
    shingles.unpersist()
  }
}
