package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The index-lifecycle measurements VERDICT r4 asked for: (a) recall
  * decay of a FROZEN IVFPQ index under distribution drift — the cost
  * [[Similarity.ivfPqIngest]]'s determinism quietly accumulates — and
  * (b) [[AnnIndex.retrainSwap]] recovering that recall with an atomic
  * generation swap readers can never observe half-done.
  *
  * Fixture: the AnnRecallSpec clustered construction (md5-seeded, no RNG
  * state) plus a DRIFTED ingest batch drawn from cluster centers shifted
  * by a vector comparable to the cluster radius — the "new topics enter
  * the corpus" regime an embedding index meets in production.
  */
class AnnLifecycleSpec extends SparkSuite {

  private val N = 384 // bootstrap corpus
  private val M = 128 // drifted ingest batch
  private val Dim = 64
  private val C = 8
  private val K = 10
  private val NQueries = 24

  private def unit(seed: String): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    v.toDouble / 2147483648.0 - 1.0
  }

  /** Base members around center(cl). Drifted members sit at the
    * MIDPOINT of two adjacent base centers (plus a small offset): new
    * topics arriving between the frozen Voronoi cells — the regime where
    * member noise flips nearest-frozen-cell assignments, so a drifted
    * cluster's rows SPLIT across cells and a probe that trusts the
    * frozen layout misses the siblings that landed on the other side. */
  private lazy val base: Seq[(Long, Seq[Double])] = (0 until N).map { i =>
    val cl = (((unit(s"k:$i") + 1.0) / 2.0) * C).toInt.min(C - 1)
    (i.toLong, (0 until Dim).map(d => unit(s"c:$cl:$d") + 0.25 * unit(s"v:$i:$d")))
  }
  private lazy val drifted: Seq[(Long, Seq[Double])] = (0 until M).map { i =>
    val id = (N + i).toLong
    val cl = (((unit(s"dk:$i") + 1.0) / 2.0) * C).toInt.min(C - 1)
    (id, (0 until Dim).map(d =>
      0.5 * (unit(s"c:$cl:$d") + unit(s"c:${(cl + 1) % C}:$d")) +
        0.15 * unit(s"shift:$cl:$d") + 0.25 * unit(s"v:$id:$d")))
  }
  private lazy val all: Seq[(Long, Seq[Double])] = base ++ drifted

  private def dotS(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
  private def cosS(a: Seq[Double], b: Seq[Double]): Double =
    dotS(a, b) / (math.sqrt(dotS(a, a)) * math.sqrt(dotS(b, b)))

  /** Queries are DRIFTED vectors: the regime where the frozen index is
    * wrong about both the probe cells and the residual codebooks. */
  private lazy val queryIds: Seq[Long] = (0 until NQueries).map(i => (N + i).toLong)

  private lazy val truth: Map[Long, Set[Long]] = {
    val byId = all.toMap
    queryIds.map { q =>
      q -> all.filter(_._1 != q)
        .map { case (id, v) => (cosS(byId(q), v), id) }
        .sortBy { case (sim, id) => (-sim, id) }.take(K).map(_._2).toSet
    }.toMap
  }

  private def recall(found: DataFrame): Double = {
    val byQ = found.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    queryIds.map { q =>
      (byQ.getOrElse(q, Array.empty).map(_._2).toSet & truth(q)).size.toDouble / K
    }.sum / NQueries
  }

  test("frozen-index drift decay is real, retrain-and-swap recovers it atomically") {
    import spark.implicits._
    val m = 8
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString + "/idx"

    // bootstrap: train on the base corpus only, commit generation 0
    val baseDf = base.toDF("vec_id", "vec")
    val seeds = Similarity.ivfCentroids(baseDf, C)
    val cents = Similarity.ivfRefine(baseDf, seeds, iters = 2).cache()
    val residuals = Similarity.ivfResiduals(
      Similarity.ivfAssign(baseDf, cents), cents)
    val books = Similarity.pqTrain(residuals, m, Dim, 16, 2, metric = "l2").cache()
    val codes0 = Similarity.ivfPqEncode(residuals, books, m, Dim)
    assert(AnnIndex.write(dir, cents, books, codes0) == "g_0")

    // O(delta) ingest of the drifted batch against the FROZEN tables
    val driftDf = drifted.toDF("vec_id", "vec")
    assert(AnnIndex.ingest(spark, dir, driftDf, m, Dim) == "g_1")
    val frozen = AnnIndex.read(spark, dir)
    assert(frozen.generation == "g_1")
    assert(frozen.codes.select("vec_id").distinct().count() == N + M)

    val queries = all.toDF("vec_id", "vec")
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    // nProbe=1 is where the probe-splitting decay shows: the boundary
    // clusters' rows straddle two frozen cells, and one probe sees only
    // one side (production tunes nProbe up to paper over exactly this —
    // at linear scan cost per extra probe)
    val rFrozen = recall(Similarity.ivfPqSearch(queries, frozen.codes,
      frozen.centroids, frozen.codebooks, m, Dim, nProbe = 1, k = K))

    // reader opens BEFORE the retrain commits: must keep materializing
    // the complete OLD generation afterwards
    val inFlightCodes = frozen.codes

    // retrain on a 60% md5 sample of the grown corpus with cell capacity
    // grown PAST the new mode count (8 base + 8 boundary clusters; 24
    // cells gives Lloyd slack to land one on each mode from imperfect
    // md5 seeds), then re-encode and swap — the full operational cycle
    val allDf = all.toDF("vec_id", "vec")
    val gen2 = AnnIndex.retrainSwap(spark, dir, allDf, nCells = 3 * C, m = m,
      dim = Dim, samplePct = 60, iters = 3)
    assert(gen2 == "g_2")
    val fresh = AnnIndex.read(spark, dir)
    assert(fresh.generation == "g_2")
    val rRetrained = recall(Similarity.ivfPqSearch(queries, fresh.codes,
      fresh.centroids, fresh.codebooks, m, Dim, nProbe = 1, k = K))

    info(f"drifted-query recall@$K at nProbe=1: frozen $rFrozen%.3f -> retrained $rRetrained%.3f")
    // the decay is the finding: the frozen index must be measurably worse
    // on drifted queries than the retrained one
    assert(rRetrained > rFrozen + 0.1,
      f"retrain did not recover drift: $rFrozen%.3f -> $rRetrained%.3f")

    // atomicity: the pre-swap reader still sees its complete generation
    // (g_1 is the retained predecessor), not a mix or a crash
    assert(inFlightCodes.select("vec_id").distinct().count() == N + M)
    // and a second swap purges g_0 entirely while g_1 survives one more
    val dirF = new java.io.File(dir)
    val gens = dirF.listFiles().map(_.getName).filter(_.startsWith("g_")).toSet
    assert(gens == Set("g_1", "g_2"), s"unexpected generations: $gens")

    // writer mutual exclusion: a second writer that derived the same next
    // generation collides on the atomic directory claim instead of
    // silently merging two writes into one generation
    val claim = new java.io.File(dirF, "g_3/_WRITER")
    claim.getParentFile.mkdirs()
    assert(claim.createNewFile())
    intercept[java.util.ConcurrentModificationException] {
      AnnIndex.write(dir, fresh.centroids, fresh.codebooks, fresh.codes)
    }
  }
}
