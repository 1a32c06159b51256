package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the perplexity filter a
  * pretraining pipeline runs after the cheap heuristics (the CCNet /
  * Wikipedia-LM recipe): train token statistics on a trusted slice,
  * score every document by average negative log-likelihood under the
  * model, drop or bucket the tail.
  *
  * This is an add-one-smoothed BIGRAM word model, end-to-end
  * relational:
  *
  *  - TRAIN = two groupBy counts over the trusted slice's exploded
  *    token bigrams/unigrams plus a distinct-vocabulary count — one
  *    shuffle each, map-side combined, output rows bounded by vocab
  *    (and far below the corpus);
  *  - SCORE = the corpus's bigrams equi-joined to the count tables
  *    (left joins: unseen context/bigram falls back to the smoothing
  *    floor 1/(c(w1)+V)), then one aggregation per doc — shuffles by
  *    bigram key and doc id, never all-pairs, never driver-side.
  *
  * Determinism: counts are exact integers, the per-bigram log is a
  * fixed f64 expression, and the per-doc mean is one SUM in a fixed
  * grouping — the q97 oracle replays the whole computation (DuckDB ln
  * agrees with java.lang.Math.log well below the round(6) the output
  * carries). At 100 TB the count tables for a word-bigram model over a
  * curated training slice are millions of rows — broadcastable when
  * small, a plain shuffle join when not; Catalyst/AQE picks.
  */
object LanguageModel {

  /** (w1, w2, c) bigram and (w1, c) unigram counts plus |vocab| from a
    * trusted training slice of (doc_id, text). Tokens come from
    * [[TextAnalysis.words]]/[[TextAnalysis.normalize]] — the same
    * tokenization every other text operator uses. */
  def trainBigram(train: DataFrame, text: Column): (DataFrame, DataFrame, Long) = {
    val toks = train.select(explode(
      TextAnalysis.words(TextAnalysis.normalize(text))).as("w"))
    val docToks = train.select(col("doc_id"),
      TextAnalysis.words(TextAnalysis.normalize(text)).as("ws"))
    val bigrams = docToks
      .select(posexplode(col("ws")).as(Seq("i", "w1")), col("ws"))
      .filter(col("i") < size(col("ws")) - 1)
      .select(col("w1"), element_at(col("ws"), col("i") + 2).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val unigrams = toks.groupBy("w").agg(count(lit(1)).as("c1"))
      .select(col("w").as("w1"), col("c1"))
    val vocab = unigrams.count()
    (bigrams, unigrams, vocab)
  }

  /** Per-doc add-one-smoothed bigram NLL over (doc_id, text):
    * (doc_id, n_bigrams, avg_nll) — avg_nll =
    * -mean(log((c2+1)/(c1+V))), with c2 = 0 (unseen bigram) and c1 = 0
    * (unseen context) falling back through the smoothing floor. Docs
    * with fewer than two tokens score NULL (no bigram evidence), kept
    * so the caller decides their fate explicitly. */
  def scoreBigram(
      docs: DataFrame,
      text: Column,
      bigrams: DataFrame,
      unigrams: DataFrame,
      vocab: Long): DataFrame = {
    val docBigrams = docs
      .select(col("doc_id"),
        TextAnalysis.words(TextAnalysis.normalize(text)).as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("i", "w1")), col("ws"))
      .filter(col("i") < size(col("ws")) - 1)
      .select(col("doc_id"), col("w1"),
        element_at(col("ws"), col("i") + 2).as("w2"))
    val nll = docBigrams
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(unigrams, Seq("w1"), "left")
      .select(col("doc_id"),
        (-log((coalesce(col("c2"), lit(0L)) + lit(1).cast("double")) /
          (coalesce(col("c1"), lit(0L)) + lit(vocab).cast("double")))).as("nll"))
    docs.select("doc_id")
      .join(
        nll.groupBy("doc_id").agg(
          count(lit(1)).as("n_bigrams"),
          (sum(col("nll")) / count(lit(1))).as("avg_nll")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))
  }
}
