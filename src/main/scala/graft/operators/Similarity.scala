package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / vector-similarity operators over an
  * embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; O(|Q|·|C|) — fine when the
  * query set is small). Scale paths: (a) blocked search — restrict the
  * pair product to a partition key (a coarse cluster id / IVF cell), and
  * (b) sign-bit LSH bucketing with md5-derived pseudo-random hyperplanes —
  * both turn the cross product into an equi-join that shuffles by bucket.
  */
object Similarity {

  /** Dot product of two double arrays — the codegen'd primitive loop
    * (graft.functions.DotProductExpr); left-to-right accumulation, so
    * bit-identical to the interpreted `aggregate(zip_with(...))` form.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast a float embedding to double once, up front — all similarity math
    * runs in f64 so results are engine-portable.
    */
  def toDouble(embedding: Column): Column = transform(embedding, _.cast("double"))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), deterministic tie-break on corpus id.
    * Norms are computed once per vector BEFORE the pair product — inside
    * the join each pair would pay two 64-element folds just to normalize.
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec: array<double>)
      corpus: DataFrame, // (vec_id, vec: array<double>)
      k: Int): DataFrame = {
    val q = queries.withColumn("qn", norm(col("qvec")))
    val c = corpus.withColumn("cn", norm(col("vec")))
    val scored = q.crossJoin(c)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qvec"), col("vec")) / (col("qn") * col("cn"))).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Blocked near-duplicate pairs: all pairs within the same block (e.g. a
    * cluster label or IVF cell id) with cosine above `threshold`. The join
    * shuffles by block, so cost is sum of per-block squares, not a global
    * cross product; norms are precomputed per vector, not per pair.
    */
  def blockedNearDupPairs(
      vectors: DataFrame, // (vec_id, vec: array<double>, block)
      threshold: Double): DataFrame = {
    val withNorm = vectors.withColumn("nrm", norm(col("vec")))
    val l = withNorm.select(col("block"), col("vec_id").as("id_a"),
      col("vec").as("va"), col("nrm").as("na"))
    val r = withNorm.select(col("block"), col("vec_id").as("id_b"),
      col("vec").as("vb"), col("nrm").as("nb"))
    // Enumerate pairs on the (few, large) blocks, then REPARTITION by pair
    // before the expensive dot products: with k blocks the join output
    // lands on ≤ k partitions (and AQE may coalesce further), serializing
    // the similarity math; the cheap extra shuffle spreads it evenly.
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .repartition(col("id_a"), col("id_b"))
      .withColumn("sim", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") > threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Sign-bit LSH bucket id: `nPlanes` pseudo-random hyperplanes, plane p's
    * coefficient for dimension d derived from md5(p||':'||d) — deterministic,
    * engine-portable, no RNG state. Bucket = the sign bits packed into an
    * int. Vectors in the same bucket are near-duplicate candidates.
    */
  def lshSignBucket(vec: Column, dims: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      // coefficient_d in [-1, 1): from the first 8 hex chars of md5(p:d)
      val proj = (0 until dims).map { d =>
        val h = conv(substring(md5(lit(s"$p:$d")), 1, 8), 16, 10).cast("double")
        val coef = h / lit(2147483648.0) - lit(1.0)
        element_at(vec, d + 1) * coef
      }.reduce(_ + _)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  // ---- IVF (inverted-file) index: the coarse-quantization scale path ----

  /** Deterministic coarse centroid seeds: the k lowest-id vectors —
    * reproducible with no RNG, which the oracle/test story needs. Refine
    * with [[ivfRefine]] before building the index; raw seeds give
    * arbitrary cell populations and poor recall per probe.
    */
  def ivfCentroids(vectors: DataFrame, k: Int): DataFrame =
    vectors.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cell"), col("vec").as("cvec"))

  /** Deterministic Lloyd (k-means) refinement of coarse centroids:
    * `iters` rounds of assign → per-cell mean. Per-dimension sums
    * accumulate in DECIMAL(27,10) (order-independent, same trick as the
    * label-centroid query), surface as double, and the divide-by-count
    * runs in f64 — NOT as a decimal quotient, whose scale-11 rounding
    * Spark applies but other engines (DuckDB divides decimals in
    * double) do not. Exact sum → IEEE double division is the
    * engine-portable formulation, so the refined centroids — and every
    * downstream cosine/rank — are bit-identical across partitionings
    * and engines. Each round is one broadcast-join assignment pass plus
    * one shuffle at the (cell, dim) grain; cells that win no vectors
    * drop out (k can only shrink), which is Lloyd's standard empty-cell
    * behavior made deterministic.
    */
  def ivfRefine(vectors: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    var cents = seeds
    for (_ <- 1 to iters) {
      cents = ivfAssign(vectors, cents)
        .select(col("cell"), posexplode(col("vec")))
        .groupBy("cell", "pos")
        .agg((sum(col("col").cast("decimal(27,10)")).cast("double") /
          count(lit(1))).as("v"))
        .groupBy("cell")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("v")))),
          s => s.getField("v")).as("cvec"))
    }
    cents
  }

  /** Assign each vector to its nearest centroid (max cosine, tie → lowest
    * cell id). Centroids are tiny → broadcast; one pass over the corpus.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("vec"), col("cvec")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("vec"), col("cell"))
  }

  /** IVF search: probe the `nProbe` nearest cells per query, exact top-k
    * within the probed cells only. At scale the candidate join shuffles by
    * cell — each query scans |corpus| * nProbe / k instead of everything.
    */
  def ivfSearch(
      queries: DataFrame, // (qid, qvec)
      assigned: DataFrame, // (vec_id, vec, cell) from ivfAssign
      centroids: DataFrame,
      nProbe: Int,
      k: Int): DataFrame = {
    val wProbe = Window.partitionBy("qid").orderBy(col("csim").desc, col("cell"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nProbe)
      .select(col("qid"), col("qvec"), col("cell"))
    val candidates = probes.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
    val wTop = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    candidates
      .withColumn("sim", cosine(col("qvec"), col("vec")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "sim", "rank")
  }
}
