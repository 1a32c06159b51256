package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSuite

/** The version log's adaptive materialization: sparse batches append
  * bucketed (directory-pruned reads), dense batches defer a residue
  * pointer (their layout buys no prune), and the first sparse batch —
  * or an explicit post-backfill [[BucketedLog.fold]] — materializes the
  * residue. Readers must see every registered version either way.
  */
class BucketedLogSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("person_id", IntegerType),
    StructField("v", IntegerType)))

  private def rows(ids: Seq[Int], tag: Int) = {
    import spark.implicits._
    ids.map(i => (i, tag)).toDF("person_id", "v")
  }

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-bucketedlog").toString

  private def sourceDir(ids: Seq[Int], tag: Int): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-bl-src").toString
    rows(ids, tag).write.mode("overwrite").parquet(d)
    d
  }

  private def readAll(path: String, n: Int) =
    BucketedLog.readBuckets(spark, path, (0 until n).toSet, schema)
      .select("person_id", "v").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  test("dense batch defers; reads still see its rows; fold materializes") {
    val path = tmp()
    val nBuckets = 16
    // dense: many keys touch most buckets -> pointer, no bucket dirs
    val denseIds = 1 to 200
    val src = sourceDir(denseIds, 0)
    val files = spark.read.parquet(src).inputFiles.toSeq
    val touched = graft.operators.BucketedSink.collectBuckets(
      rows(denseIds, 0).select("person_id"), nBuckets)
    assert(touched.size > nBuckets / 4)
    BucketedLog.appendOrDefer(rows(denseIds, 0), path, "person_id",
      nBuckets, touched, files, schema)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "__bucket=0")),
      "dense batch must not materialize bucket directories")
    // unfolded residue is visible to readers, regardless of buckets asked
    assert(readAll(path, nBuckets) == denseIds.map((_, 0)).toSet)
    assert(BucketedLog.readBuckets(spark, path, Set(0), schema).count() == 200,
      "residue is read unpruned (dense by construction)")

    // explicit fold: rows land in buckets, pointer is gone
    BucketedLog.fold(spark, path, "person_id", nBuckets, schema)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .exists(_.getPath.getName.startsWith("__bucket=")))
    assert(readAll(path, nBuckets) == denseIds.map((_, 0)).toSet)
    val pruned = BucketedLog.readBuckets(spark, path, Set(0), schema).count()
    assert(pruned > 0 && pruned < 200, "folded reads prune by bucket")
  }

  test("first sparse batch folds accumulated residue automatically") {
    val path = tmp()
    val nBuckets = 16
    val bulk = 1 to 200
    val srcBulk = sourceDir(bulk, 0)
    BucketedLog.appendOrDefer(rows(bulk, 0), path, "person_id", nBuckets,
      graft.operators.BucketedSink.collectBuckets(
        rows(bulk, 0).select("person_id"), nBuckets),
      spark.read.parquet(srcBulk).inputFiles.toSeq, schema)

    // sparse: one key -> appendOrDefer folds the bulk, then appends
    val sparseIds = Seq(7)
    BucketedLog.appendOrDefer(rows(sparseIds, 1), path, "person_id", nBuckets,
      graft.operators.BucketedSink.collectBuckets(
        rows(sparseIds, 1).select("person_id"), nBuckets),
      Seq("unused"), schema)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "_residue")) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(path, "_residue")).isEmpty,
      "sparse batch must fold the residue away")
    assert(readAll(path, nBuckets) ==
      (bulk.map((_, 0)).toSet ++ sparseIds.map((_, 1))))
  }

  test("defer is idempotent under replay (same file list, one pointer)") {
    val path = tmp()
    val src = sourceDir(1 to 50, 0)
    val files = spark.read.parquet(src).inputFiles.toSeq
    BucketedLog.defer(spark, path, files)
    BucketedLog.defer(spark, path, files) // crash-replay re-registers
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(
      new org.apache.hadoop.fs.Path(path, "_residue")).length == 1)
    assert(readAll(path, 16) == (1 to 50).map((_, 0)).toSet)
  }

  test("missing source files fall back to a real append") {
    val path = tmp()
    val nBuckets = 16
    val denseIds = 1 to 200
    // dense but no known source files -> must append (a pointer needs
    // something to point at)
    BucketedLog.appendOrDefer(rows(denseIds, 0), path, "person_id", nBuckets,
      graft.operators.BucketedSink.collectBuckets(
        rows(denseIds, 0).select("person_id"), nBuckets),
      Seq.empty, schema)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .exists(_.getPath.getName.startsWith("__bucket=")))
    assert(readAll(path, nBuckets) == denseIds.map((_, 0)).toSet)
  }
}
