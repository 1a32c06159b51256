package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import graft.operators.BucketedSink

/** Append-only version log partitioned by key bucket — the cascade's
  * answer to "read only the touched persons' HISTORY, in bytes opened,
  * not just in rows kept".
  *
  * [[graft.sources.ChangeFeed]] prunes by TIME (day partitions: "what
  * changed since the watermark"); this log prunes by KEY (hash buckets:
  * "every version this person ever had"). The streamed cascade needs the
  * latter for retraction recompute — rebuilding a touched person's groups
  * requires all their surviving versions, and with the source directory
  * as one flat file pile that read was an O(accumulated log) scan every
  * micro-batch even though the plan kept only the touched persons' rows.
  * Bucketing the log by `pmod(hash(person_id), N)` turns it into an
  * O(touched buckets' history) directory-pruned read, the same
  * file-level discipline [[graft.operators.BucketedSink.readBuckets]]
  * applies to the stored flat tables.
  *
  * Layout: `path/__bucket=<b>/part-*.parquet`, plain directory append.
  * Each append lands one file per touched bucket (rows are co-located by
  * bucket before the write, the same small-files rule as
  * `ChangeFeed.append`), so file count grows with batches x delta
  * buckets; a real deployment compacts old appends per bucket
  * periodically — compaction is a pure rewrite (the log is a set of
  * version rows; readers tolerate any file arrangement) and needs no
  * coordination with readers beyond the usual atomic-rename discipline.
  *
  * At-least-once appenders (foreachBatch replay after a crash) may land
  * the same version rows twice. That is deliberate: consumers go through
  * a latest-version-per-key window (`IncrementalEtlStream.currentState`)
  * for which exact duplicate rows are ties broken among identical
  * contents — append-first-then-process makes the crash window safe with
  * no transactional machinery.
  */
object BucketedLog {

  private val BucketCol = "__bucket"

  def exists(conf: Configuration, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** Seed (or re-seed) the log with the full version history — first
    * arrival only. Overwrite, not append, so a crash-and-replay of the
    * seeding batch is idempotent. */
  def overwrite(df: DataFrame, path: String, keyCol: String, nBuckets: Int): Unit =
    write(df, path, keyCol, nBuckets, "overwrite")

  /** Append one batch of version rows. */
  def append(df: DataFrame, path: String, keyCol: String, nBuckets: Int): Unit =
    write(df, path, keyCol, nBuckets, "append")

  private def write(
      df: DataFrame, path: String, keyCol: String, nBuckets: Int,
      mode: String): Unit =
    df.withColumn(BucketCol, BucketedSink.bucketOf(col(keyCol), nBuckets))
      // co-locate each bucket's rows so the write lands one file per
      // touched bucket instead of tasks x buckets slivers
      .repartition(col(BucketCol))
      .write.partitionBy(BucketCol).mode(mode).parquet(path)

  /** All version rows of the given buckets — pruned at the DIRECTORY
    * level: bucket directory names are deterministic, so the selected
    * paths are constructed (existence-checked, not listed) and only they
    * are handed to the reader; no file index over the rest of the log is
    * ever built. A bucket directory may be absent (no key of that bucket
    * has any version yet) — absent directories contribute nothing.
    * `schema` supplies the frame shape when every selected bucket is
    * absent. */
  def readBuckets(
      spark: SparkSession, path: String, buckets: Set[Int],
      schema: StructType): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = buckets.toSeq.sorted
      .map(b => new Path(root, s"$BucketCol=$b"))
      .filter(fs.exists)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.option("basePath", path)
        .parquet(dirs.map(_.toString): _*)
        .drop(BucketCol)
  }
}
