package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** HNSW persistence lifecycle over the AnnIndex generation store:
  * build → persist → search-without-rebuild must equal the in-memory
  * path; ingest must rebuild ONLY the touched shards (untouched shards'
  * serialized rows carry through verbatim) and commit atomically with
  * the predecessor retained. */
class HnswLifecycleSpec extends SparkSuite {
  import spark.implicits._

  private def vec(id: Long, dim: Int): Array[Double] =
    Array.tabulate(dim)(d => math.sin(id * 0.7 + d * 1.3) + 0.01 * ((id + d) % 7))

  private def corpusDf(ids: Seq[Long]) =
    ids.map(i => (i, vec(i, 16).toSeq)).toDF("vec_id", "vec")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-hnsw-idx").toString

  private val params = Hnsw.Params(m = 8, efConstruction = 32, efSearch = 48)

  test("persisted search equals the in-memory build") {
    val dir = tmp()
    val corpus = corpusDf(0L until 400L)
    val queries = (0L until 6L).map(i => (i, vec(i, 16).toSeq)).toDF("qid", "qvec")
    val gen = Hnsw.persist(dir, corpus, params, nShards = 4)
    assert(gen == "g_0")
    val mem = Hnsw.topK(queries, corpus, k = 5, params, nShards = 4)
      .select("qid", "vec_id", "sim", "rank").collect().map(_.toSeq).toSet
    val per = Hnsw.searchPersisted(spark, dir, queries, k = 5, params)
      .select("qid", "vec_id", "sim", "rank").collect().map(_.toSeq).toSet
    assert(per == mem)
  }

  test("ingest rebuilds only the touched shards and results include the batch") {
    val dir = tmp()
    val nShards = 4
    Hnsw.persist(dir, corpusDf(0L until 300L), params, nShards)
    val before = AnnIndex.readGeneration(spark, dir)._2("graph")
      .select("shard", "vec_id", "vec", "neighbors")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Double](2), r.getSeq[scala.collection.Seq[Long]](3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap

    val newIds = Seq(500L, 501L)
    val touched = newIds
      .map(i => Hnsw.shardOf(lit(i), nShards)).map(c =>
        spark.range(1).select(c.as("s")).first().getInt(0)).toSet
    val gen = Hnsw.ingest(spark, dir, corpusDf(newIds), params)
    assert(gen == "g_1")

    val after = AnnIndex.readGeneration(spark, dir)._2("graph")
      .select("shard", "vec_id", "vec", "neighbors")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Double](2), r.getSeq[scala.collection.Seq[Long]](3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap

    (0 until nShards).filterNot(touched).foreach { s =>
      assert(after(s) == before(s), s"untouched shard $s was rewritten")
    }
    touched.foreach { s =>
      assert(after(s).map(_._2).toSet ==
        before.getOrElse(s, Seq.empty).map(_._2).toSet ++ newIds.filter(
          i => spark.range(1).select(Hnsw.shardOf(lit(i), nShards)).first().getInt(0) == s))
    }

    // the ingested ids are searchable, and the merged result equals a
    // fresh in-memory build over the full corpus
    val full = corpusDf((0L until 300L) ++ newIds)
    val queries = Seq((500L, vec(500L, 16).toSeq)).toDF("qid", "qvec")
    val mem = Hnsw.topK(queries, full, k = 5, params, nShards)
      .select("qid", "vec_id", "sim", "rank").collect().map(_.toSeq).toSet
    val per = Hnsw.searchPersisted(spark, dir, queries, k = 5, params)
      .select("qid", "vec_id", "sim", "rank").collect().map(_.toSeq).toSet
    assert(per == mem)
  }

  test("ingest of an existing id replaces its vector") {
    val dir = tmp()
    Hnsw.persist(dir, corpusDf(0L until 100L), params, nShards = 2)
    val replaced = Seq((5L, vec(9000L, 16).toSeq)).toDF("vec_id", "vec")
    Hnsw.ingest(spark, dir, replaced, params)
    val graph = AnnIndex.readGeneration(spark, dir)._2("graph")
    assert(graph.filter(col("vec_id") === 5L).count() == 1)
    val v = graph.filter(col("vec_id") === 5L)
      .select("vec").first().getSeq[Double](0)
    assert(v == vec(9000L, 16).toSeq)
  }

  test("exactShardThreshold makes small-shard search exact at any beam") {
    val corpus = corpusDf(0L until 200L)
    val queries = (0L until 4L).map(i => (i, vec(i, 16).toSeq)).toDF("qid", "qvec")
    // deliberately hopeless beam (ef=2) rescued by the threshold
    val p = Hnsw.Params(m = 8, efConstruction = 32, efSearch = 2,
      exactShardThreshold = 4096)
    val got = Hnsw.topK(queries, corpus, k = 5, p, nShards = 2)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._3))
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (s, (pp, q)) => s + pp * q }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val all = (0L until 200L).map(i => (i, vec(i, 16)))
    val want = (0L until 4L).flatMap { qid =>
      val q = vec(qid, 16)
      all.filter(_._1 != qid).map { case (id, v) => (id, cosine(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, _), r) => (qid, id, r + 1) }
    }
    assert(got.toSeq == want)
  }
}
