package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned incremental sink — the "write O(delta), not
  * O(table)" path (a poor man's Delta/Iceberg MERGE on plain parquet).
  *
  * The table is laid out as `__bucket=K/` partitions, K = pmod(hash(key),
  * nBuckets). A full rebuild writes every bucket; an incremental tick
  * computes the buckets containing touched keys and dynamically overwrites
  * ONLY those partition directories — at 100 TB with a steady-state delta
  * touching a few thousand persons, that is a few buckets instead of the
  * whole table. Unchanged bucket directories are left byte-identical.
  *
  * Tradeoff vs [[graft.etl.Pipeline.writeSnapshot]]'s versioned pointer:
  * dynamic partition overwrite mutates the live directory per bucket, so a
  * reader racing the write can see bucket A new + bucket B old (Delta's
  * manifest commit is what removes this window in production). Single-
  * writer, reader-after-tick deployments — the reference's cron model —
  * are unaffected.
  */
object BucketedSink {

  def bucketOf(key: Column, nBuckets: Int): Column = pmod(hash(key), lit(nBuckets))

  /** Full write: every bucket. */
  def writeFull(df: DataFrame, path: String, keyCol: String, nBuckets: Int): Unit =
    df.withColumn("__bucket", bucketOf(col(keyCol), nBuckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)

  /** Incremental write: overwrite only buckets holding a touched key.
    * `merged` is the complete post-tick table (so dropped rows vanish from
    * their rewritten bucket); `touchedKeys` is a one-column DataFrame of
    * the keys this tick changed, created, or retracted — a SUPERSET is
    * safe (extra buckets rewritten identically), a miss is not.
    */
  def overwriteChanged(
      merged: DataFrame,
      path: String,
      keyCol: String,
      nBuckets: Int,
      touchedKeys: DataFrame): Unit = {
    val buckets = touchedKeys
      .select(bucketOf(col(touchedKeys.columns.head), nBuckets).as("__bucket"))
      .distinct()
    merged.withColumn("__bucket", bucketOf(col(keyCol), nBuckets))
      .join(buckets, Seq("__bucket"), "left_semi")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket").parquet(path)
  }

  /** Read the bucketed table back (partition column dropped — callers see
    * the logical schema). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")
}
