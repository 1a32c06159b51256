package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Recall measurements the uniform embeddings fixture cannot show
  * (SCALE.md records recall@5 flat under Lloyd refinement there: uniform
  * data has no cluster structure for centroids to align with). This
  * fixture is deterministically CLUSTERED — md5-seeded cluster centers
  * plus bounded md5-seeded perturbation, no RNG state — so quantization
  * improvements convert to recall and can be asserted, not just argued:
  *
  *  (a) Lloyd-refined IVF centroids beat raw seeds at equal nProbe;
  *  (b) IVFPQ (residual codebooks) beats flat PQ at equal codebook budget.
  */
class AnnRecallSpec extends SparkSuite {

  private val N = 512
  private val Dim = 64
  private val C = 16

  /** md5-derived uniform in [-1, 1): deterministic, engine-portable. */
  private def unit(seed: String): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    v.toDouble / 2147483648.0 - 1.0
  }

  /** (vec_id, vec): cluster centers on md5("c:cluster:dim"), members =
    * center + 0.25 * md5-noise. Cluster of vector i is itself md5-drawn,
    * so the k lowest ids do NOT cover the clusters evenly — raw
    * [[Similarity.ivfCentroids]] seeds start imbalanced, which is the
    * regime Lloyd refinement exists for. */
  private lazy val rows: Seq[(Long, Seq[Double])] = (0 until N).map { i =>
    val cl = (((unit(s"k:$i") + 1.0) / 2.0) * C).toInt.min(C - 1)
    val vec = (0 until Dim).map { d =>
      unit(s"c:$cl:$d") + 0.25 * unit(s"v:$i:$d")
    }
    (i.toLong, vec)
  }

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private val K = 10
  private val NQueries = 32

  /** Exact cosine top-K per query id (self excluded) — the ground truth. */
  private lazy val truth: Map[Long, Set[Long]] = {
    val byId = rows.toMap
    (0L until NQueries.toLong).map { q =>
      q -> rows.filter(_._1 != q)
        .map { case (id, v) => (cos(byId(q), v), id) }
        .sortBy { case (sim, id) => (-sim, id) }.take(K).map(_._2).toSet
    }.toMap
  }

  private def recall(found: DataFrame): Double = {
    val byQ = found.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    (0L until NQueries.toLong).map { q =>
      val hits = byQ.getOrElse(q, Array.empty).map(_._2).toSet
      (hits & truth(q)).size.toDouble / K
    }.sum / NQueries
  }

  test("clustered fixture: Lloyd refinement and IVFPQ convert to recall@10 gains") {
    import spark.implicits._
    val emb = rows.toDF("vec_id", "vec")
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))

    // (a) refinement at nProbe=1 — the regime where seed imbalance
    // actually costs: a query whose cluster no raw seed represents well
    // probes the wrong cell and misses everything
    val seeds = Similarity.ivfCentroids(emb, C)
    val refined = Similarity.ivfRefine(emb, seeds, iters = 2)
    def ivfRecall(cents: DataFrame, nProbe: Int): Double = recall(
      Similarity.ivfSearch(queries, Similarity.ivfAssign(emb, cents),
        cents, nProbe, k = K))
    val rSeed = ivfRecall(seeds, 1)
    val rRef = ivfRecall(refined, 1)
    info(f"IVF recall@$K nProbe=1: seeds $rSeed%.3f -> refined $rRef%.3f")
    assert(rRef > rSeed + 0.02,
      f"refinement did not improve recall: $rSeed%.3f -> $rRef%.3f")
    assert(rRef > 0.85, f"refined IVF recall too low: $rRef%.3f")

    // (b) equal codebook budget (m=8 subspaces, k=16 codewords, 2 Lloyd
    // rounds): flat PQ over raw vectors vs PQ over IVF residuals with
    // probed search — residuals span a smaller volume, so the same
    // budget buys less reconstruction error, which IS the recall
    val m = 8; val kw = 16
    val flatBooks = Similarity.pqTrain(emb, m, dim = Dim, k = kw, iters = 2)
    val flatCodes = Similarity.pqEncode(emb, flatBooks, m, dim = Dim)
    val rFlat = recall(
      Similarity.pqSearch(queries, flatCodes, flatBooks, m, dim = Dim, k = K))

    val assigned = Similarity.ivfAssign(emb, refined)
    val residuals = Similarity.ivfResiduals(assigned, refined)
    val resBooks = Similarity.pqTrain(residuals, m, dim = Dim, k = kw,
      iters = 2, metric = "l2")
    val ivfpqCodes = Similarity.ivfPqEncode(residuals, resBooks, m, dim = Dim)
    val rIvfPq = recall(
      Similarity.ivfPqSearch(queries, ivfpqCodes, refined, resBooks,
        m, dim = Dim, nProbe = 3, k = K))
    info(f"PQ recall@$K: flat $rFlat%.3f -> IVFPQ $rIvfPq%.3f")
    assert(rIvfPq > rFlat + 0.05,
      f"residual encoding did not improve recall: flat $rFlat%.3f vs IVFPQ $rIvfPq%.3f")
    // absolute guard against degenerate codes, not a quality target:
    // recall@10 ≈ 0.5 is the honest regime for 8-byte codes ranking
    // same-cluster members apart by their noise — production systems
    // rerank the ADC top-N with full vectors to close that gap
    assert(rIvfPq > 0.45, f"IVFPQ recall degenerate: $rIvfPq%.3f")

    // (c) the rerank stage closes most of that gap: exact cosine over the
    // ADC top-30 should approach the IVF probe ceiling (every true
    // neighbor in a probed cell that survives the candidate cut is
    // ranked perfectly)
    val rRerank = recall(
      Similarity.ivfPqSearchRerank(queries, ivfpqCodes, refined, resBooks,
        emb, m, dim = Dim, nProbe = 3, nCandidates = 30, k = K))
    info(f"IVFPQ+rerank recall@$K: $rIvfPq%.3f -> $rRerank%.3f")
    assert(rRerank > rIvfPq + 0.1,
      f"rerank did not lift recall: $rIvfPq%.3f -> $rRerank%.3f")
    assert(rRerank > 0.8, f"reranked recall too low: $rRerank%.3f")
  }

  test("binary sign quantization: Hamming prefilter + rerank recall@10") {
    import spark.implicits._
    val emb = rows.toDF("vec_id", "vec")
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))

    // 8-byte codes, no training at all — the floor of the compression
    // family. The prefilter keeps 30 of 511 (~6%); rerank is exact over
    // those, so recall@10 IS the prefilter's hit rate on true neighbors.
    def binRecall(nCand: Int): Double = recall(
      Similarity.binarySignSearchRerank(queries, emb, Dim, nCand, K))
    val r30 = binRecall(30)
    val r60 = binRecall(60)
    info(f"binary+rerank recall@$K: nCand=30 $r30%.3f, nCand=60 $r60%.3f")
    // clustered data: same-cluster sign patterns agree on most axes, so
    // the 1-bit sketch should rank true neighbors into a 6% candidate cut
    // far better than chance (chance recall ≈ nCand/N ≈ 0.06)
    assert(r30 > 0.5, f"binary prefilter recall degenerate: $r30%.3f")
    // widening the candidate cut must monotonically help (same rerank)
    assert(r60 >= r30, f"recall fell as candidates widened: $r30%.3f -> $r60%.3f")
  }

  test("composed IVF + Hamming prefilter + rerank approaches the probe ceiling") {
    import spark.implicits._
    val emb = rows.toDF("vec_id", "vec")
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val seeds = Similarity.ivfCentroids(emb, C)
    val refined = Similarity.ivfRefine(emb, seeds, iters = 2)
    val assigned = Similarity.ivfAssign(emb, refined)

    // ceiling: exact cosine over everything in the probed cells
    val rProbe = recall(
      Similarity.ivfSearch(queries, assigned, refined, nProbe = 3, k = K))
    // composed: same probe set, but candidates pass through the 8-byte
    // Hamming cut before the exact rerank — the only recall it can lose
    // is a true neighbor the sign sketch ranks outside the top-30 of
    // its probed cells
    val rComposed = recall(
      Similarity.ivfBinarySearchRerank(queries, assigned, refined,
        dims = Dim, nProbe = 3, nCandidates = 30, k = K))
    info(f"IVF probe ceiling $rProbe%.3f -> composed+Hamming30 $rComposed%.3f")
    assert(rProbe > 0.85, f"probe ceiling unexpectedly low: $rProbe%.3f")
    assert(rComposed > rProbe - 0.15,
      f"Hamming prefilter cost too much recall: $rProbe%.3f -> $rComposed%.3f")
    // and widening the cut recovers the ceiling: with every probed-cell
    // member surviving the prefilter, the composed search IS ivfSearch
    val rWide = recall(
      Similarity.ivfBinarySearchRerank(queries, assigned, refined,
        dims = Dim, nProbe = 3, nCandidates = N, k = K))
    assert(rWide == rProbe,
      f"composed with an uncut prefilter must equal ivfSearch: $rWide%.3f vs $rProbe%.3f")
  }
}
