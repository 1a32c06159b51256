package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-shard EXACT-substring dedup via suffix arrays — the "no training
  * sequence may share a ≥L-token substring with another" rule
  * (the Lee et al. 2021 deduplication recipe), which q101's L-gram span
  * signal approximates by exploding every gram. The suffix-array form
  * computes the IDENTICAL per-position coverage — a position is inside
  * a duplicated span iff some L-window covering it repeats — without
  * materializing grams: O(shard tokens) memory, no gram shuffle, and
  * maximal-match detection in one sorted pass.
  *
  * Sharding is the scale contract, per the published recipe: shards are
  * sized to task memory (a few GB of tokens each at 100 TB), the
  * operator NEVER builds a global structure, and duplicates are caught
  * within a shard — so the caller picks a shard key that colocates
  * likely duplicates (domain/URL prefix/cluster id; cross-shard recall
  * is what MinHash-LSH q34 and the capped variants already provide).
  * Detection is deterministic given the shard assignment: grouping is
  * by the EXPLICIT shard key, never by physical partition.
  *
  * Equivalence to the gram replay (the q129 oracle): a shared substring
  * of length ≥ L contains repeated L-windows covering exactly its
  * positions; conversely any repeated L-window is a shared substring.
  * Suffix-array neighbors: a window starting at s repeats iff the
  * suffix at s shares an LCP ≥ L with an SA-adjacent suffix (same-doc
  * repeats included, matching the gram count's n ≥ 2 within shard).
  * Per-doc sentinels make cross-doc phantom matches impossible.
  */
object SuffixArrayDedup {

  /** Prefix-doubling suffix array over an int sequence (O(n log^2 n) —
    * shards are memory-sized, so the log factor is irrelevant next to
    * the shuffle it replaces). */
  private[operators] def suffixArray(t: Array[Int]): Array[Int] = {
    val n = t.length
    var sa = Array.range(0, n)
    var rank = t.clone()
    var k = 1
    var cont = n > 1
    while (cont) {
      val kk = k
      val r = rank
      def key(i: Int): (Int, Int) = (r(i), if (i + kk < n) r(i + kk) else Int.MinValue)
      sa = sa.sortBy(key)
      val next = new Array[Int](n)
      next(sa(0)) = 0
      var i = 1
      while (i < n) {
        next(sa(i)) = next(sa(i - 1)) + (if (key(sa(i)) == key(sa(i - 1))) 0 else 1)
        i += 1
      }
      rank = next
      cont = rank(sa(n - 1)) != n - 1
      k *= 2
    }
    sa
  }

  /** Kasai LCP: lcp(j) = common prefix length of suffixes SA[j-1], SA[j]. */
  private[operators] def lcpArray(t: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = t.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && t(i + h) == t(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** One shard's docs → per-doc (id, nTokens, nDupPositions): build the
    * sentinel-separated token sequence, mark window starts whose suffix
    * shares LCP ≥ minTokens with an SA neighbor, then union the
    * [s, s+minTokens) cover intervals per doc. */
  private[operators] def shardStats(
      docs: Seq[(Long, Seq[String])], minTokens: Int): Seq[(Long, Int, Int)] = {
    val dict = new java.util.HashMap[String, Integer]()
    val total = docs.map(_._2.size).sum + docs.size
    val t = new Array[Int](total)
    val bases = new Array[Int](docs.size)
    var pos = 0
    var sentinel = -1
    docs.zipWithIndex.foreach { case ((_, ws), d) =>
      bases(d) = pos
      ws.foreach { w =>
        var id = dict.get(w)
        if (id == null) { id = dict.size() + 1; dict.put(w, id) }
        t(pos) = id; pos += 1
      }
      t(pos) = sentinel; sentinel -= 1; pos += 1 // unique per doc: no cross-doc match
    }
    val sa = suffixArray(t)
    val lcp = lcpArray(t, sa)
    val rep = new Array[Boolean](total)
    var j = 0
    while (j < total) {
      val s = sa(j)
      val m = math.max(if (j > 0) lcp(j) else 0, if (j + 1 < total) lcp(j + 1) else 0)
      if (m >= minTokens) rep(s) = true
      j += 1
    }
    docs.zipWithIndex.map { case ((id, ws), d) =>
      val n = ws.size
      val base = bases(d)
      // union of [s, s+minTokens) over rep starts s within this doc
      var covered = 0
      var coveredUntil = 0 // exclusive, doc-relative
      var s = 0
      while (s + minTokens <= n) {
        if (rep(base + s)) {
          val from = math.max(s, coveredUntil)
          val until = s + minTokens
          if (until > from) covered += until - from
          coveredUntil = math.max(coveredUntil, until)
        }
        s += 1
      }
      (id, n, covered)
    }
  }

  /** Per-doc duplicated-span stats, sharded by `shard`: (doc_id,
    * n_tokens, n_dup_positions, dup_frac). Text is normalized and
    * whitespace-tokenized ([[TextAnalysis.normalize]]/[[TextAnalysis.words]]);
    * a position counts as duplicated iff it lies inside a ≥`minTokens`
    * substring occurring at least twice within the shard. */
  def spanStats(
      docs: DataFrame, id: Column, text: Column,
      minTokens: Int, shard: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prepped = docs.select(
      id.cast("long").as("id"),
      filter(TextAnalysis.words(TextAnalysis.normalize(text)), w => w =!= "")
        .as("w"),
      shard.cast("int").as("shard"))
      .as[(Long, Seq[String], Int)]
    prepped.groupByKey(_._3)
      .flatMapGroups { (_, rows) =>
        val shardDocs = rows.map(r => (r._1, r._2)).toSeq
        shardStats(shardDocs, minTokens).iterator
      }
      .toDF("doc_id", "n_tokens", "n_dup_positions")
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_dup_positions").cast("long").as("n_dup_positions"),
        when(col("n_tokens") > 0,
          round(col("n_dup_positions").cast("double") / col("n_tokens"), 6))
          .otherwise(0.0).as("dup_frac"))
  }
}
