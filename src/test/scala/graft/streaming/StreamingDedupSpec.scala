package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSuite
import graft.operators.{Dedup, TextAnalysis}

class StreamingDedupSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def docsAll: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

  /** The q57 batch reference over the whole corpus. */
  private def fullCorpusPairs(docs: DataFrame): Set[(Long, Long, Double)] = {
    val shingles = docs.select(col("doc_id").as("id"),
        explode(TextAnalysis.shingles(
          TextAnalysis.words(TextAnalysis.normalize(col("text"))), 3)).as("shingle"))
      .distinct().cache()
    try Dedup.jaccardVerify(shingles,
        Dedup.lshCandidatePairs(Dedup.minhashBands(shingles, 8, 2)))
      .filter(col("jaccard") >= 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    finally shingles.unpersist()
  }

  private def pairsOf(indexDir: String, pairsDir: String): Set[(Long, Long, Double)] =
    StreamingDedup.readPairs(spark, indexDir, pairsDir)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def bandsOf(indexDir: String): Seq[String] =
    StreamingDedup.readBands(spark, indexDir)
      .select("id", "band", "bkey").collect().map(_.toString).sorted.toSeq

  test("streamed chunked ingest emits exactly the full-corpus LSH pairs") {
    val root = Files.createTempDirectory("graft-streamdedup")
    val docsDir = root.resolve("docs").toString
    val docs = docsAll
    // three arrival chunks, one file each — maxFilesPerTrigger=1 makes
    // each a separate micro-batch against the index grown so far
    (0 to 2).foreach { c =>
      docs.filter(pmod(col("doc_id"), lit(3)) === c).coalesce(1)
        .write.mode("append").parquet(docsDir)
    }

    val indexDir = root.resolve("index").toString
    val pairsDir = root.resolve("pairs").toString
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(docsDir)
    val q = StreamingDedup.start(
      stream, indexDir, pairsDir,
      checkpointDir = root.resolve("ckpt").toString,
      trigger = Trigger.AvailableNow())
    assert(q.awaitTermination(300000), "stream did not drain in time")

    assert(pairsOf(indexDir, pairsDir) == fullCorpusPairs(docs))

    // the grown band index equals the full-corpus bands (same rows, no
    // duplicates) — the invariant that keeps batch N+1's cost O(batch)
    val shingles = docs.select(col("doc_id").as("id"),
        explode(TextAnalysis.shingles(
          TextAnalysis.words(TextAnalysis.normalize(col("text"))), 3)).as("shingle"))
      .distinct()
    val wantBands = Dedup.minhashBands(shingles, 8, 2)
      .select("id", "band", "bkey").collect().map(_.toString).sorted.toSeq
    assert(bandsOf(indexDir) == wantBands)
  }

  test("exactly-once: crash mid-write + retry + redelivery neither dups nor drops") {
    import spark.implicits._
    val docs = docsAll
    def chunk(c: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === c)
    def ingest(indexDir: String, pairsDir: String, c: Int, bid: Long): Unit =
      StreamingDedup.ingestBatch(chunk(c), bid, indexDir, pairsDir,
        shingleN = 3, k = 8, rowsPerBand = 2, threshold = 0.1)

    // reference run: uninterrupted
    val a = Files.createTempDirectory("graft-eo-a")
    val (idxA, prsA) = (a.resolve("index").toString, a.resolve("pairs").toString)
    (0 to 2).foreach(c => ingest(idxA, prsA, c, c.toLong))

    // faulted run: batch 1's first attempt dies AFTER staging partial
    // pairs and bands but BEFORE the commit — exactly the window the old
    // plain-append layout turned into duplicates
    val b = Files.createTempDirectory("graft-eo-b")
    val (idxB, prsB) = (b.resolve("index").toString, b.resolve("pairs").toString)
    ingest(idxB, prsB, 0, 0L)
    Seq((999999L, 999998L, 0.5)).toDF("id_a", "id_b", "jaccard")
      .write.mode("overwrite").parquet(s"$prsB/b_1")
    Seq((999999L, 0, "deadbeef")).toDF("id", "band", "bkey")
      .write.mode("overwrite").parquet(s"$idxB/bands/b_1")
    // the crashed attempt must be invisible: only batch 0 is committed
    assert(StreamingDedup.committedBatches(
      spark.sparkContext.hadoopConfiguration, idxB) == Seq(0L))
    ingest(idxB, prsB, 1, 1L) // retry
    ingest(idxB, prsB, 2, 2L)

    assert(pairsOf(idxB, prsB) == pairsOf(idxA, prsA))
    assert(bandsOf(idxB) == bandsOf(idxA))

    // redelivery after a successful commit is a no-op
    val before = StreamingDedup.readPairs(spark, idxB, prsB).count()
    ingest(idxB, prsB, 1, 1L)
    assert(StreamingDedup.readPairs(spark, idxB, prsB).count() == before)
    assert(pairsOf(idxB, prsB) == pairsOf(idxA, prsA))
  }

  test("streamed cluster maintenance equals from-scratch CC over all pairs") {
    import spark.implicits._
    val docs = docsAll
    val root = Files.createTempDirectory("graft-streamdedup-cc")
    val (idx, prs) = (root.resolve("index").toString, root.resolve("pairs").toString)
    (0 to 2).foreach(c =>
      StreamingDedup.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === c), c.toLong,
        idx, prs, shingleN = 3, k = 8, rowsPerBand = 2, threshold = 0.1))

    val got = StreamingDedup.readClusters(spark, idx)
      .as[(Long, Long, Boolean)].collect().toSet
    val want = graft.operators.Cluster.dedupAssignments(
        StreamingDedup.readPairs(spark, idx, prs))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == want,
      "incrementally maintained clusters diverge from global CC")
    // the fixture must actually exercise a cross-batch merge: at least
    // one cluster with members in different arrival chunks
    val crossBatch = want.groupBy(_._2)
      .exists(_._2.map(m => m._1 % 3).size > 1)
    assert(crossBatch, "fixture has no cross-batch cluster — test is vacuous")

    // a batch retried after a crash recomputes against the committed
    // fold and converges to the same assignment
    val before = got
    StreamingDedup.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), 1L,
      idx, prs, 3, 8, 2, 0.1) // redelivery: no-op
    assert(StreamingDedup.readClusters(spark, idx)
      .as[(Long, Long, Boolean)].collect().toSet == before)
  }

  test("readers before the first commit see empty frames, not a crash") {
    // a monitoring reader racing the first micro-batch: no _COMMITTED yet
    val root = Files.createTempDirectory("graft-streamdedup-empty")
    val idx = root.resolve("index").toString
    val prs = root.resolve("pairs").toString
    val pairs = StreamingDedup.readPairs(spark, idx, prs)
    assert(pairs.columns.toSeq == Seq("id_a", "id_b", "jaccard"))
    assert(pairs.count() == 0)
    val bands = StreamingDedup.readBands(spark, idx)
    assert(bands.columns.toSeq == Seq("id", "band", "bkey"))
    assert(bands.count() == 0)
    val shingles = StreamingDedup.readShingles(spark, idx)
    assert(shingles.columns.toSeq == Seq("id", "shingle"))
    assert(shingles.count() == 0)
    // and they must union cleanly with the post-commit schema
    val docs = docsAll.limit(10).coalesce(1)
    StreamingDedup.ingestBatch(docs, 0L, idx, prs, 3, 8, 2, 0.1)
    assert(StreamingDedup.readBands(spark, idx).schema ==
      bands.schema)
  }
}
