package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-n-gram linear text classifier — the fastText/DCLM/FineWeb-edu
  * model-based quality-filter pattern as pure relational algebra: explode
  * word n-grams, hash each into one of `dim` feature buckets (md5,
  * engine-portable), count per (doc, bucket), join the broadcast-sized
  * weight vector, and score `sigmoid(bias + sum(count * weight))`.
  *
  * Training happens offline; INFERENCE — the part a 100 TB pipeline
  * actually runs per document — is one shuffle keyed by (doc, bucket)
  * plus one broadcast join, no UDFs, fully codegen'd. The weighted sum
  * accumulates in DECIMAL so the logit is independent of aggregation
  * order. Cross-engine bit-parity rests on both engines performing the
  * IDENTICAL double multiply (count × weight — 0.001 etc. are not exact
  * in binary) followed by the identical double→decimal cast, then exact
  * DECIMAL summation; reordering the multiply-then-cast sequence would
  * break oracle parity even though the decimal sum itself is exact.
  */
object HashedClassifier {

  /** md5-derived feature bucket in [0, dim) — the hashing trick. */
  def featureBucket(gram: Column, dim: Int): Column =
    pmod(conv(substring(md5(gram), 1, 8), 16, 10).cast("long"), lit(dim.toLong))

  /** (id, bucket, n): hashed n-gram count features. Docs with fewer than
    * `n` words contribute no rows — the caller decides their fate (the
    * conventional choice scores them sigmoid(bias) via a left join). */
  def features(
      df: DataFrame, id: Column, text: Column, n: Int, dim: Int): DataFrame =
    df.select(id.as("id"),
        explode(TextAnalysis.shingles(
          TextAnalysis.words(TextAnalysis.normalize(text)), n)).as("gram"))
      .select(col("id"), featureBucket(col("gram"), dim).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("n"))

  /** Score per id: sigmoid(bias + Σ n·weight). `weights` is a
    * (bucket, weight) frame — dim rows, always broadcast-sized (a
    * 2^20-bucket model is 8 MB). */
  def score(features: DataFrame, weights: DataFrame, bias: Double): DataFrame =
    features.join(broadcast(weights), Seq("bucket"))
      .groupBy("id")
      .agg((lit(bias) +
        sum((col("n") * col("weight")).cast("decimal(27,10)")).cast("double"))
        .as("z"))
      .select(col("id"),
        (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("score"))
}
