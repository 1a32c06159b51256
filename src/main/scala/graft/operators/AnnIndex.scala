package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned IVFPQ index store — the lifecycle half of the ANN story.
  *
  * [[Similarity.ivfPqIngest]] keeps a FROZEN index maintainable at
  * O(delta) per batch, but frozen centroids/codebooks quantize a
  * drifting corpus ever worse (AnnLifecycleSpec measures the decay).
  * The operational answer is periodic retrain-and-swap, and the swap
  * must be atomic: an index is three co-trained tables (centroids,
  * codebooks, codes), and a reader mixing generation A centroids with
  * generation B codes computes garbage ADC scores — silently, since
  * nothing fails type-wise.
  *
  * Layout: each generation lives in its own `g_<n>/` directory holding
  * all three tables; `_CURRENT` is a one-line pointer file replaced by
  * FileContext.rename(OVERWRITE) — the same single-atomic-rename commit
  * the snapshot sink and streaming-dedup manifest use. A reader
  * resolves the pointer once and reads three tables of ONE generation;
  * the previous generation is retained one swap for readers whose lazy
  * plans already resolved its files, older ones are purged.
  */
object AnnIndex {

  final case class Handle(centroids: DataFrame, codebooks: DataFrame,
      codes: DataFrame, generation: String)

  private def pointerPath(dir: String) = new Path(dir, "_CURRENT")

  private def currentGen(conf: Configuration, dir: String): Option[String] = {
    val ptr = pointerPath(dir)
    val fs = ptr.getFileSystem(conf)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, StandardCharsets.UTF_8).trim)
      } finally in.close()
    }
  }

  /** Write all three tables as a fresh generation and commit it with one
    * atomic pointer rename. Returns the committed generation name.
    *
    * Concurrency contract: SINGLE WRITER (like the snapshot sink) —
    * write/ingest/retrainSwap are read-modify-write against `_CURRENT`,
    * so two concurrent writers would both derive the same next
    * generation and one batch would silently vanish. Rather than just
    * documenting that, both hazard windows are checked: the generation
    * directory is claimed via atomic create-if-absent (two writers that
    * read the same `prev` collide HERE, loudly), and `_CURRENT` is
    * re-read immediately before the pointer rename (a writer that lost
    * a longer race aborts instead of clobbering the winner's commit).
    * Readers need no lock: they resolve the pointer once and the
    * predecessor generation is retained one swap for their lazy plans;
    * a handle held across TWO swaps may lose files to the purge —
    * re-[[read]] per query, don't cache handles across retrain cadence. */
  def write(dir: String, centroids: DataFrame, codebooks: DataFrame,
      codes: DataFrame): String =
    commit(dir, Seq(
      "centroids" -> centroids, "codebooks" -> codebooks, "codes" -> codes))

  /** The generic generation commit behind [[write]] — any co-trained
    * table set (IVFPQ's three tables, [[Hnsw]]'s graph + meta) shares
    * the same atomicity and single-writer contract. */
  def commit(dir: String, tables: Seq[(String, DataFrame)]): String = {
    require(tables.nonEmpty, "a generation needs at least one table")
    val conf = tables.head._2.sparkSession.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val prev = currentGen(conf, dir)
    val next = "g_" + (prev.map(_.stripPrefix("g_").toLong + 1).getOrElse(0L))
    val gen = new Path(root, next)
    // atomic create-if-absent claims the generation number exclusively
    val claim = new Path(gen, "_WRITER")
    try fs.create(claim, false).close()
    catch { case e: java.io.IOException =>
      throw new java.util.ConcurrentModificationException(
        s"generation $next at $dir already claimed by a concurrent writer", e)
    }
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(new Path(gen, name).toString)
    }
    // conditional commit: if another writer advanced the pointer while
    // this generation was being written, abort — committing would base
    // g_{n} on a stale predecessor and drop the interleaved batch
    val nowCur = currentGen(conf, dir)
    if (nowCur != prev) throw new java.util.ConcurrentModificationException(
      s"_CURRENT moved from $prev to $nowCur during write of $next at $dir")
    val tmp = new Path(root, "_CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(next.getBytes(StandardCharsets.UTF_8)) finally out.close()
    FileContext.getFileContext(root.toUri, conf)
      .rename(tmp, pointerPath(dir), Options.Rename.OVERWRITE)
    // keep the live generation and its predecessor; purge older
    val keep = Set(next) ++ prev
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("g_") && !keep.contains(n))
        fs.delete(st.getPath, true)
    }
    next
  }

  /** Resolve the live generation ONCE and return a loader over its
    * tables — a coherent view no concurrent swap can tear. Generic twin
    * of [[read]], for [[commit]]-written stores. */
  def readGeneration(spark: SparkSession, dir: String): (String, String => DataFrame) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val gen = currentGen(conf, dir).getOrElse(throw new IllegalStateException(
      s"no committed ANN index at $dir"))
    (gen, name => spark.read.parquet(new Path(new Path(dir, gen), name).toString))
  }

  /** Resolve the live generation ONCE and open its three tables — a
    * coherent index view no concurrent swap can tear. */
  def read(spark: SparkSession, dir: String): Handle = {
    val conf = spark.sparkContext.hadoopConfiguration
    val gen = currentGen(conf, dir).getOrElse(throw new IllegalStateException(
      s"no committed ANN index at $dir"))
    val g = new Path(dir, gen)
    Handle(
      spark.read.parquet(new Path(g, "centroids").toString),
      spark.read.parquet(new Path(g, "codebooks").toString),
      spark.read.parquet(new Path(g, "codes").toString),
      gen)
  }

  /** O(delta) ingest against the LIVE generation: encode the batch with
    * its frozen tables ([[Similarity.ivfPqIngest]]) and commit
    * codes ∪ batch as a new generation reusing the frozen
    * centroids/codebooks. The commit stays a single pointer rename, so
    * ingest and retrain share one concurrency story. (The codes rewrite
    * is O(index) in files but O(delta) in NEW encoding work; a
    * production deployment points `codes` at a BucketedSink table to
    * make the write O(delta) too — the machinery already exists.) */
  def ingest(spark: SparkSession, dir: String, newVectors: DataFrame,
      m: Int, dim: Int): String = {
    val cur = read(spark, dir)
    val batch = Similarity.ivfPqIngest(newVectors, cur.centroids,
      cur.codebooks, m, dim)
    write(dir, cur.centroids, cur.codebooks, cur.codes.unionByName(batch))
  }

  /** Retrain-and-swap: re-seed + Lloyd-refine centroids on a
    * deterministic md5 sample of the CURRENT corpus, retrain residual
    * codebooks, re-encode every vector, and commit the new generation
    * atomically. Readers holding the old handle keep a complete old
    * index; new readers get a complete new one — never a mix. Training
    * cost is bounded by `samplePct`; the re-encode is the unavoidable
    * O(corpus) pass (it is what un-drifts the stored codes), run at
    * retrain cadence, not per batch.
    */
  def retrainSwap(spark: SparkSession, dir: String,
      vectors: DataFrame, // (vec_id, vec) — the full current corpus
      nCells: Int, m: Int, dim: Int,
      samplePct: Int = 20, iters: Int = 2): String = {
    require(samplePct >= 1 && samplePct <= 100, s"samplePct in [1,100], got $samplePct")
    val sample =
      if (samplePct == 100) vectors
      else vectors.filter(
        Curation.samplingBucket(col("vec_id"), 100) < samplePct)
    val seeds = Similarity.ivfCentroids(sample, nCells)
    val centroids = Similarity.ivfRefine(sample, seeds, iters).cache()
    val assigned = Similarity.ivfAssign(vectors, centroids)
    val residuals = Similarity.ivfResiduals(assigned, centroids)
    val sampleResiduals = Similarity.ivfResiduals(
      Similarity.ivfAssign(sample, centroids), centroids)
    val codebooks = Similarity.pqTrain(sampleResiduals, m, dim, 16,
      iters, metric = "l2").cache()
    val codes = Similarity.ivfPqEncode(residuals, codebooks, m, dim)
    write(dir, centroids, codebooks, codes)
  }
}
