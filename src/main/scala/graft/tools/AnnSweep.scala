package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Similarity}

/** Cross-family ANN recall sweep — IVF (probe sweep), HNSW (beam
  * sweep), and sign-LSH bucketing, all against the same brute-force
  * ground truth on the real embeddings table. The per-family specs pin
  * each index against itself (AnnRecallSpec, HnswSpec); this tool
  * answers the cross-cutting question a 100 TB deployment asks — which
  * index family covers which recall/cost envelope — with measured rows
  * for SCALE.md rather than an argument.
  *
  * Cost axis per family:
  *  - IVF: exact candidate fraction (probed cells' sizes / corpus) —
  *    the fraction of the corpus each query scans;
  *  - HNSW: efSearch (the beam bound; visited nodes ~ ef * degree,
  *    independent of corpus size per shard — the point of the graph);
  *  - sign-LSH: exact candidate fraction of the query's bucket.
  *
  * Usage: runMain graft.tools.AnnSweep  (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_ANN_QUERIES)
  */
object AnnSweep {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "64").toInt
    val k = 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("vec"))
      .persist()
    val n = emb.count()
    val dim = emb.select(size(col("vec"))).first().getInt(0)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("vec").as("qvec")).persist()

    val truth = Similarity.bruteForceTopK(queries, emb, k)
      .select(col("qid"), col("vec_id")).persist()
    val nTruth = truth.count()
    println(s"corpus $n vectors dim $dim, $nQueries queries, ground truth top-$k ($nTruth pairs)")

    def recall(found: DataFrame): Double = {
      val hit = truth.join(found.select("qid", "vec_id").distinct(),
        Seq("qid", "vec_id")).count()
      hit.toDouble / nTruth
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // IVF: refined centroids, nProbe sweep; candidate fraction is exact
    val cells = 32
    val cents = Similarity.ivfRefine(emb, Similarity.ivfCentroids(emb, cells), iters = 2)
    val assigned = Similarity.ivfAssign(emb, cents).persist()
    assigned.count()
    val cellSizes = assigned.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (nProbe <- Seq(1, 2, 4, 8)) {
      val probes = queries.crossJoin(broadcast(cents))
        .withColumn("csim", Similarity.cosine(col("qvec"), col("cvec")))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("csim").desc, col("cell"))))
        .filter(col("__rn") <= nProbe)
        .select("qid", "cell").collect()
      val scanFrac = probes.groupBy(_.getLong(0)).values
        .map(_.map(r => cellSizes.getOrElse(r.getInt(1), 0L)).sum.toDouble / n)
        .sum / nQueries
      val (r, secs) = timed(recall(
        Similarity.ivfSearch(queries, assigned, cents, nProbe, k)))
      println(f"IVF      cells=$cells nProbe=$nProbe%-2d recall@$k ${r}%.3f  scan ${scanFrac * 100}%5.1f%%  ${secs}%5.1f s")
    }

    // HNSW: shard-local graphs, efSearch sweep
    for (ef <- Seq(8, 16, 32, 64, 96)) {
      val (r, secs) = timed(recall(Hnsw.topK(queries, emb, k,
        params = Hnsw.Params(m = 8, efConstruction = 32, efSearch = ef),
        nShards = 8)))
      println(f"HNSW     m=8 shards=8 ef=$ef%-3d recall@$k ${r}%.3f  ${secs}%5.1f s")
    }

    // sign-LSH bucketing: candidates share the query's bucket
    for (planes <- Seq(4, 6, 8)) {
      val bucketed = emb.withColumn("b",
        Similarity.lshSignBucket(col("vec"), dim, planes)).persist()
      val qb = queries.withColumn("b",
        Similarity.lshSignBucket(col("qvec"), dim, planes))
      val cand = qb.join(bucketed, Seq("b"))
        .filter(col("vec_id") =!= col("qid"))
      val scanFrac = cand.count().toDouble / (nQueries.toDouble * n)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id"))
      val (r, secs) = timed(recall(cand
        .withColumn("sim", Similarity.cosine(col("qvec"), col("vec")))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)))
      println(f"signLSH  planes=$planes%-2d          recall@$k ${r}%.3f  scan ${scanFrac * 100}%5.1f%%  ${secs}%5.1f s")
      bucketed.unpersist()
    }

    spark.stop()
  }
}
