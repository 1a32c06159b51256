package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge-table TRAINING as relational rounds — the other half of the
  * subword story (q126's `SubwordTokenizer` is inference against a given
  * vocabulary; this LEARNS the vocabulary from the corpus, the
  * Sennrich et al. 2016 recipe):
  *
  * 1. distinct words with corpus frequencies (one keyed count);
  * 2. each word starts character-segmented;
  * 3. per round: count adjacent symbol pairs weighted by word frequency
  *    (map-side-combinable), take the arg-max pair (count desc, then
  *    lexicographic — fully deterministic), and merge it greedily
  *    left-to-right in every word's segmentation.
  *
  * The greedy merge is a left fold whose accumulator peeks only at its
  * LAST symbol — "a a a" merges to "(aa) a", never "(a (aa))" — which is
  * both canonical BPE behavior and the exact shape DuckDB's list_reduce
  * replays, so the oracle pins every training round's chosen pair and
  * weighted count, not just the final table.
  *
  * Scale shape: the segmentation table stays distributed (vocabulary
  * grain — millions of rows at 100 TB, never the corpus grain); each
  * round is one pair-count shuffle with map-side partials plus a
  * TakeOrdered(1) arg-max; the merge applies as a per-row HOF with no
  * shuffle. The k driver-side collects are single-row scalars (the
  * watermark precedent). k is small by construction — a real tokenizer
  * build runs tens of thousands of rounds of THIS exact shape.
  */
object BpeTrainer {

  /** Greedy left-to-right application of one merge to a symbol array:
    * fold starting from the first symbol, merging when the accumulator's
    * last symbol is `left` and the incoming one is `right`. */
  def applyMerge(sym: org.apache.spark.sql.Column, left: String, right: String): org.apache.spark.sql.Column = {
    val tail = slice(sym, lit(2), greatest(size(sym) - 1, lit(0)))
    aggregate(tail, slice(sym, lit(1), lit(1)),
      (acc, x) => when(element_at(acc, -1) === left && x === right,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))
  }

  /** Learn `k` merges from (word, freq) rows; returns the merge table
    * (rank, left_sym, right_sym, pair_count) as a DataFrame. Training
    * stops early if the corpus runs out of repeated pairs. */
  def train(spark: SparkSession, wordFreq: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    // split on the empty pattern keeps a trailing "" (Java split with
    // limit -1) — strip it, SQL's char expansion has no such artifact
    var seg = wordFreq.select(col("word"), col("freq"),
      array_remove(split(col("word"), ""), "").as("sym"))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val n = size(col("sym"))
      val pairs = seg.select(col("freq"),
          explode(zip_with(
            slice(col("sym"), lit(1), n - 1),
            slice(col("sym"), lit(2), n - 1),
            (a, b) => struct(a.as("lft"), b.as("rgt")))).as("p"))
        .select(col("freq"), col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .groupBy("lft", "rgt").agg(sum("freq").as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("lft"), col("rgt")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        // pin each round's segmentation: the next round's plan must not
        // replay every earlier merge fold over the base table
        seg = seg.withColumn("sym", applyMerge(col("sym"), l, r))
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.result().toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** Corpus entry point: normalize/tokenize, count word frequencies,
    * train. */
  def trainOnCorpus(
      spark: SparkSession,
      docs: DataFrame,
      text: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val wf = docs
      .select(explode(TextAnalysis.words(TextAnalysis.normalize(text))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    train(spark, wf, k)
  }
}
