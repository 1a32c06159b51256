package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational full-text retrieval: position-aware postings, BM25
  * ranking, and exact phrase search — the IR surface a corpus-curation
  * engine needs for "find documents like/about X" passes (hard-negative
  * mining, topic filtering, eval-set assembly).
  *
  * Everything is postings-shaped: one (doc, term, pos) instance
  * relation, aggregated by (doc, term) for frequencies and joined on
  * (doc, pos±k) for adjacency. No inverted map structure is
  * materialized driver-side — the "index" IS the keyed relation, which
  * shuffles by term (so a 100 TB corpus spreads hot terms' postings by
  * partition) and whose every consumer is a keyed join or
  * map-side-combinable count.
  */
object InvertedIndex {

  /** Instance-grain postings: (id, pos, term), one row per token.
    * Empty tokens (a split artifact of empty text) are dropped, so an
    * empty document simply has no postings. */
  def postings(docs: DataFrame, id: Column, words: Column): DataFrame =
    docs.select(id.as("id"), posexplode(words).as(Seq("pos", "term")))
      .filter(col("term") =!= "")

  /** The maintained index state: postings + the aggregates BM25 reads.
    * All four frames are MERGEABLE over doc-disjoint batches — postings
    * and doc lengths by union, per-term doc frequencies and the corpus
    * totals by addition — so a 100 TB index grows by tokenizing ONLY
    * the arriving batch, never re-reading the corpus. */
  final case class TextIndex(
      postings: DataFrame,
      docLen: DataFrame, // (id, dl)
      termDf: DataFrame, // (term, df)
      corpusStats: DataFrame) // one row: (n_docs, tot)

  /** Index one (batch of) docs from scratch. */
  def buildIndex(docs: DataFrame, id: Column, words: Column): TextIndex = {
    val post = postings(docs, id, words)
    val dl = post.groupBy("id").agg(count(lit(1)).as("dl"))
    val df_ = post.select("id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(post.agg(count(lit(1)).as("tot"))))
    TextIndex(post, dl, df_, stats)
  }

  /** O(delta) maintenance: merge an existing index with a NEW batch's
    * index. Batches must be doc-disjoint (the CDC/append contract every
    * incremental here shares): doc frames union, per-term df and the
    * corpus totals add. */
  def mergeIndex(a: TextIndex, b: TextIndex): TextIndex = TextIndex(
    a.postings.unionByName(b.postings),
    a.docLen.unionByName(b.docLen),
    a.termDf.unionByName(b.termDf)
      .groupBy("term").agg(sum("df").as("df")),
    a.corpusStats.unionByName(b.corpusStats)
      .agg(sum("n_docs").as("n_docs"), sum("tot").as("tot")))

  /** BM25 over a maintained [[TextIndex]] — scoring never re-touches
    * raw documents; see [[bm25TopK]] for the formula and plan notes. */
  def bm25FromIndex(
      idx: TextIndex,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val stats = idx.corpusStats
      .select(col("n_docs"),
        (col("tot").cast("double") / col("n_docs")).as("avgdl"))
    val tf = idx.postings.filter(col("term").isInCollection(queryTerms))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = idx.termDf.filter(col("term").isInCollection(queryTerms))
    val scored = tf
      .join(idx.docLen, Seq("id"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("id").agg(sum(col("w")).as("score"))
    val top = scored.orderBy(col("score").desc, col("id")).limit(k)
    val win = Window.orderBy(col("score").desc, col("id"))
    top.withColumn("rank", row_number().over(win))
      .select(col("id"), round(col("score"), 6).as("score"), col("rank"))
  }

  /** One-shot BM25 top-k — unlike [[bm25FromIndex]] this computes df
    * lazily for the QUERY terms only (docs sharing no query term never
    * leave their partitions), the right shape when the index is not
    * reused; a standing index amortizes the full [[buildIndex]] df
    * instead. Both paths produce identical scores (q142/q156 share one
    * oracle).
    *
    * BM25 top-k (Robertson/Spärck Jones weights, the Lucene +1 idf
    * form): score(d, Q) = Σ_t ln(1 + (N − df + ½)/(df + ½)) ·
    * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)). N is the FULL corpus
    * count and avgdl its exact token total over N — both one-row
    * aggregates broadcast into the scoring join. Docs sharing no query
    * term never leave their partitions.
    *
    * Ranking is on the raw double (desc, id asc) — ln is the one
    * non-correctly-rounded IEEE op here, and the q97/q102 precedent
    * (JVM vs DuckDB ln agree far below the 6-decimal output rounding)
    * carries: identical expression structure on both engines.
    */
  def bm25TopK(
      docs: DataFrame,
      id: Column,
      words: Column,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val post = postings(docs, id, words)
    val dl = post.groupBy("id").agg(count(lit(1)).as("dl"))
    // N over the FULL corpus, avgdl from the exact posting total — one
    // double division both engines perform on identical integers
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(post.agg(count(lit(1)).as("tot")))
      .select(col("n_docs"),
        (col("tot").cast("double") / col("n_docs")).as("avgdl"))
    val tf = post.filter(col("term").isInCollection(queryTerms))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(dl, Seq("id"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("id").agg(sum(col("w")).as("score"))
    // two-phase top-k: orderBy+limit plans TakeOrderedAndProject
    // (per-partition heads, one k-row merge at the driver side of the
    // exchange) — NOT a global single-partition window sort over every
    // scored doc; the rank window then runs on k rows only
    val top = scored.orderBy(col("score").desc, col("id")).limit(k)
    val win = Window.orderBy(col("score").desc, col("id"))
    top.withColumn("rank", row_number().over(win))
      .select(col("id"), round(col("score"), 6).as("score"), col("rank"))
  }

  /** Exact phrase search: doc matches at position p when phrase(i) sits
    * at p + i for every i — a chain of (id, pos) equi-joins on the
    * postings, one per phrase term, each pre-filtered to its term (so
    * the joins move only the phrase terms' postings, never the corpus).
    * Output (id, n_matches) for docs with at least one occurrence.
    */
  def phraseMatches(post: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val first = post.filter(col("term") === phrase.head)
      .select(col("id"), col("pos"))
    phrase.zipWithIndex.drop(1)
      .foldLeft(first) { case (acc, (t, i)) =>
        acc.join(
          post.filter(col("term") === t)
            .select(col("id"), (col("pos") - i).as("pos")),
          Seq("id", "pos"))
      }
      .groupBy("id").agg(count(lit(1)).as("n_matches"))
  }

  /** Reciprocal-rank fusion of two retrieval rankings (Cormack et al.'s
    * RRF, the standard lexical+semantic hybrid-search combiner):
    * score(d) = Σ 1/(k + rank_r(d)) over the rankings that surfaced d.
    * Rank positions — not raw scores — carry the signal, so BM25 logits
    * and cosine similarities need no calibration against each other.
    *
    * Both inputs are top-N lists (id, rank), so the fused frame is
    * bounded by 2N rows — the full-outer join and the global ordering
    * window are over a result list, never a corpus. The fused score is
    * one fixed expression (coalesce + coalesce), not an aggregate fold,
    * so its doubles are bit-identical across engines and partitionings;
    * ties break on id. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60): DataFrame = {
    val l = a.select(col("id"), col("rank").as("rank_a"))
    val r = b.select(col("id"), col("rank").as("rank_b"))
    l.join(r, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("rank_b")), lit(0.0)))
      .withColumn("fused_rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("id"))))
  }
}
