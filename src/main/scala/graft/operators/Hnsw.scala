package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** HNSW graph ANN — the industry-default index family (Malkov & Yashunin
  * 2016), built SHARD-LOCAL the way every Spark-scale deployment runs
  * it: the corpus hash-partitions into shards, each executor builds an
  * in-memory navigable-small-world graph over ITS shard, the (small,
  * broadcast) query set searches every shard graph independently, and
  * the per-shard top-k merge to a global top-k with one tiny shuffle.
  * Nothing about the build is cross-shard — at 100 TB you add shards,
  * not graph height, and a shard rebuild touches one partition.
  *
  * Everything is DETERMINISTIC, unlike reference HNSW implementations
  * that draw levels from an RNG: a node's level is derived from the
  * md5 of its id (geometric with p = 1/M, the paper's distribution),
  * insertion order is ascending id, and every candidate ordering breaks
  * ties on id — so two builds of the same shard are byte-identical and
  * results are oracle-replayable.
  *
  * Similarity is cosine with the house fold order (left-to-right f64
  * dot, `dot/(sqrt·sqrt)` normalization) so scores are bit-identical to
  * the brute-force baseline and the DuckDB oracle.
  */
object Hnsw {

  /** M = max neighbors per node per layer (2M at layer 0, the paper's
    * convention); efConstruction / efSearch are the build/search beam
    * widths. */
  final case class Params(m: Int = 8, efConstruction: Int = 32,
      efSearch: Int = 48)

  /** Deterministic level: md5(id) → uniform (0,1) → geometric with
    * p = 1/m, capped at 16 (a graph needs astronomically many nodes to
    * reach it). */
  def levelOf(id: Long, m: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("US-ASCII"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    val u = ((v >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0,1]
    math.min(16, (-math.log(u) / math.log(m.toDouble)).toInt)
  }

  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** One shard's graph: parallel arrays over local node indices. */
  final class Graph(val ids: Array[Long], val vecs: Array[Array[Double]],
      val norms: Array[Double], m: Int) {
    val levels: Array[Int] = ids.map(levelOf(_, m))
    // adjacency(level)(node) — only nodes with levels(node) >= level have
    // entries above level 0
    val adjacency: Array[Array[mutable.ArrayBuffer[Int]]] = {
      val maxL = if (levels.isEmpty) 0 else levels.max
      Array.tabulate(maxL + 1)(_ => Array.fill(ids.length)(mutable.ArrayBuffer[Int]()))
    }
    var entry: Int = -1
    var entryLevel: Int = -1
    def sim(n: Int, q: Array[Double], qNorm: Double): Double =
      dotD(vecs(n), q) / (norms(n) * qNorm)
  }

  /** Beam search at one level from `starts`: the ef best nodes found.
    * Candidate expansion is best-first; orderings tie-break on id so the
    * visit sequence (hence the result on equal sims) is deterministic. */
  private def searchLevel(g: Graph, q: Array[Double], qNorm: Double,
      starts: Seq[Int], level: Int, ef: Int): mutable.ArrayBuffer[Int] = {
    // max-heap of candidates to expand (best sim first, then lowest id)
    val candOrd = Ordering.by[(Double, Int), (Double, Long)] {
      case (s, n) => (s, -g.ids(n))
    }
    val cand = mutable.PriorityQueue.empty[(Double, Int)](candOrd)
    // min-heap of current results (worst first) — bounded at ef
    val res = mutable.PriorityQueue.empty[(Double, Int)](candOrd.reverse)
    val visited = mutable.HashSet[Int]()
    starts.foreach { s =>
      if (visited.add(s)) {
        val sm = g.sim(s, q, qNorm)
        cand.enqueue((sm, s)); res.enqueue((sm, s))
      }
    }
    while (res.size > ef) res.dequeue()
    while (cand.nonEmpty) {
      val (cs, cn) = cand.dequeue()
      val worst = if (res.isEmpty) Double.NegativeInfinity else res.head._1
      if (cs < worst && res.size >= ef) { cand.clear() }
      else {
        g.adjacency(level)(cn).foreach { nb =>
          if (visited.add(nb)) {
            val sm = g.sim(nb, q, qNorm)
            if (res.size < ef || sm > res.head._1 ||
                (sm == res.head._1 && g.ids(nb) < g.ids(res.head._2))) {
              cand.enqueue((sm, nb))
              res.enqueue((sm, nb))
              if (res.size > ef) res.dequeue()
            }
          }
        }
      }
    }
    val out = mutable.ArrayBuffer[Int]()
    res.foreach { case (_, n) => out += n }
    // best-first, deterministic
    out.sortInPlaceBy(n => (-g.sim(n, q, qNorm), g.ids(n)))
    out
  }

  /** Greedy single-step descent used above the target layer. */
  private def greedy(g: Graph, q: Array[Double], qNorm: Double,
      start: Int, level: Int): Int = {
    var cur = start
    var curSim = g.sim(cur, q, qNorm)
    var improved = true
    while (improved) {
      improved = false
      g.adjacency(level)(cur).foreach { nb =>
        val sm = g.sim(nb, q, qNorm)
        if (sm > curSim || (sm == curSim && g.ids(nb) < g.ids(cur))) {
          cur = nb; curSim = sm; improved = true
        }
      }
    }
    cur
  }

  /** Build a shard graph over (id, vec) pairs — insertion in ascending
    * id order, so the graph is a pure function of the shard's content. */
  def buildShard(shard: Seq[(Long, Array[Double])], p: Params): Graph = {
    val sorted = shard.sortBy(_._1)
    val ids = sorted.map(_._1).toArray
    val vecs = sorted.map(_._2).toArray
    val norms = vecs.map(v => math.sqrt(dotD(v, v)))
    val g = new Graph(ids, vecs, norms, p.m)
    var n = 0
    while (n < ids.length) {
      val l = g.levels(n)
      if (g.entry < 0) { g.entry = n; g.entryLevel = l }
      else {
        val q = vecs(n); val qn = norms(n)
        var cur = g.entry
        var lev = g.entryLevel
        while (lev > l) { cur = greedy(g, q, qn, cur, lev); lev -= 1 }
        var starts: Seq[Int] = Seq(cur)
        var lev2 = math.min(l, g.entryLevel)
        while (lev2 >= 0) {
          val found = searchLevel(g, q, qn, starts, lev2, p.efConstruction)
          val maxDeg = if (lev2 == 0) 2 * p.m else p.m
          val neighbors = found.take(p.m)
          neighbors.foreach { nb =>
            g.adjacency(lev2)(n) += nb
            g.adjacency(lev2)(nb) += n
            val lst = g.adjacency(lev2)(nb)
            if (lst.length > maxDeg) { // prune: keep best by (sim, id)
              val kept = lst.sortBy(x =>
                (-g.sim(x, vecs(nb), norms(nb)), g.ids(x))).take(maxDeg)
              lst.clear(); lst ++= kept
            }
          }
          starts = found.toSeq
          lev2 -= 1
        }
        if (l > g.entryLevel) { g.entry = n; g.entryLevel = l }
      }
      n += 1
    }
    g
  }

  /** Search one shard graph: top-k (id, sim), self-match excluded when
    * `excludeId` is set. */
  def searchShard(g: Graph, q: Array[Double], k: Int, ef: Int,
      excludeId: Long = Long.MinValue): Seq[(Long, Double)] = {
    if (g.entry < 0) return Seq.empty
    val qn = math.sqrt(dotD(q, q))
    var cur = g.entry
    var lev = g.entryLevel
    while (lev > 0) { cur = greedy(g, q, qn, cur, lev); lev -= 1 }
    val found = searchLevel(g, q, qn, Seq(cur), 0, math.max(ef, k + 1))
    found.iterator.map(n => (g.ids(n), g.sim(n, q, qn)))
      .filter(_._1 != excludeId)
      .toSeq.sortBy { case (id, s) => (-s, id) }
      .take(k)
  }

  /** Distributed top-k: shard the corpus, build a graph per shard, search
    * the BROADCAST query set against each, merge per-shard winners. The
    * query set is collected to the driver — the small-query-set contract
    * the whole ANN family shares (q40's scaladoc); corpus scale lives in
    * the shards. Output: (qid, vec_id, sim, rank). */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
      params: Params = Params(), nShards: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows: Array[(Long, Array[Double])] = queries
      .select(col("qid").cast("long"), col("qvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val qB = spark.sparkContext.broadcast(qRows)
    val p = params
    val shardResults = corpus
      .select(col("vec_id").cast("long"), col("vec"))
      .repartition(nShards, col("vec_id"))
      .mapPartitions { it =>
        val shard = it.map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
        if (shard.isEmpty) Iterator.empty
        else {
          val g = buildShard(shard, p)
          qB.value.iterator.flatMap { case (qid, qv) =>
            searchShard(g, qv, k, p.efSearch, excludeId = qid)
              .map { case (id, s) => (qid, id, s) }
          }
        }
      }
      .toDF("qid", "vec_id", "sim")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    shardResults.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
