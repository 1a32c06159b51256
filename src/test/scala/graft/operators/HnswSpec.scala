package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HnswSpec extends SparkSuite {
  import spark.implicits._

  private def vec(id: Long, dim: Int): Array[Double] =
    Array.tabulate(dim)(d => math.sin(id * 0.7 + d * 1.3) + 0.01 * ((id + d) % 7))

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("level assignment is deterministic and geometric-ish") {
    val levels = (0L until 2000L).map(Hnsw.levelOf(_, 8))
    assert(levels == (0L until 2000L).map(Hnsw.levelOf(_, 8)))
    val l0 = levels.count(_ == 0).toDouble / levels.size
    assert(l0 > 0.8 && l0 < 0.95) // p(level 0) = 1 - 1/8 = 0.875
    assert(levels.max >= 2)       // some nodes reach upper layers
  }

  test("shard build is deterministic: same input, identical adjacency") {
    val shard = (0L until 300L).map(i => (i, vec(i, 32)))
    val g1 = Hnsw.buildShard(shard, Hnsw.Params())
    val g2 = Hnsw.buildShard(scala.util.Random.shuffle(shard.toList),
      Hnsw.Params()) // build sorts by id, so input order must not matter
    assert(g1.ids.toSeq == g2.ids.toSeq)
    g1.adjacency.zip(g2.adjacency).foreach { case (l1, l2) =>
      l1.zip(l2).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    }
  }

  test("generous-beam search is exact on a 400-node shard") {
    val shard = (0L until 400L).map(i => (i, vec(i, 32)))
    val g = Hnsw.buildShard(shard, Hnsw.Params(m = 8, efConstruction = 32))
    (0L until 20L).foreach { qid =>
      val q = vec(qid, 32)
      val exact = shard.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
      val got = Hnsw.searchShard(g, q, k = 5, ef = 48, excludeId = qid)
      assert(got.map(_._1) == exact.map(_._1), s"query $qid")
    }
  }

  test("q208's production params are exact on a 250-node shard") {
    val shard = (0L until 250L).map(i => (i, vec(i, 64)))
    val g = Hnsw.buildShard(shard, Hnsw.Params(m = 16, efConstruction = 64))
    (0L until 10L).foreach { qid =>
      val q = vec(qid, 64)
      val exact = shard.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
      assert(Hnsw.searchShard(g, q, k = 5, ef = 96, excludeId = qid)
        .map(_._1) == exact.map(_._1), s"query $qid")
    }
  }

  test("narrow-beam recall is high but search is sublinear-ish") {
    val shard = (0L until 1000L).map(i => (i, vec(i, 32)))
    val g = Hnsw.buildShard(shard, Hnsw.Params(m = 8, efConstruction = 32))
    var hit = 0; var total = 0
    (0L until 30L).foreach { qid =>
      val q = vec(qid + 5000, 32) // out-of-corpus queries
      val exact = shard.map { case (id, v) => (id, cosine(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val got = Hnsw.searchShard(g, q, k = 10, ef = 24).map(_._1)
      hit += got.count(exact); total += 10
    }
    assert(hit.toDouble / total >= 0.9, s"recall@10 = ${hit.toDouble / total}")
  }

  test("distributed topK merges shards to the exact global answer") {
    val corpus = (0L until 500L).map(i => (i, vec(i, 16).toSeq)).toDF("vec_id", "vec")
    val queries = (0L until 5L).map(i => (i, vec(i, 16).toSeq)).toDF("qid", "qvec")
    val got = Hnsw.topK(queries, corpus, k = 5, nShards = 4)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._3))
    val all = (0L until 500L).map(i => (i, vec(i, 16)))
    val want = (0L until 5L).flatMap { qid =>
      val q = vec(qid, 16)
      all.filter(_._1 != qid).map { case (id, v) => (id, cosine(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, _), r) => (qid, id, r + 1) }
    }
    assert(got.toSeq == want)
  }

  test("empty and tiny shards: no crash, right counts") {
    val corpus = (0L until 3L).map(i => (i, vec(i, 8).toSeq)).toDF("vec_id", "vec")
    val queries = Seq((99L, vec(99, 8).toSeq)).toDF("qid", "qvec")
    val got = Hnsw.topK(queries, corpus, k = 5, nShards = 8).collect()
    assert(got.length == 3) // only 3 candidates exist
  }
}
