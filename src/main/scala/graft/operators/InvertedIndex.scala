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

  /** BM25 top-k (Robertson/Spärck Jones weights, the Lucene +1 idf
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
}
