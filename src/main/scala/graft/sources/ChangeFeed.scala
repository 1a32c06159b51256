package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned change feeds: the O(delta) answer to the tick's
  * retraction/purge scans (SCALE.md).
  *
  * The incremental stages discover work with single-column time-predicate
  * scans (`date_created > wm`, `date_voided > wm`, `date_changed > wm`).
  * Over a JDBC source those predicates push down to server-side indexes
  * and are O(delta) already (JdbcSourceSpec); over a parquet snapshot they
  * read one pruned column of the WHOLE table every tick — at 100 TB that
  * is real money per tick even at column granularity, because a row
  * voided in place carries no file-level ordering the reader can prune on.
  *
  * The fix is a layout, not an operator: keep the narrow change columns in
  * a side feed partitioned by `change_day` = date of the row's latest
  * modification (what any CDC export — Debezium, DMS, a nightly
  * modified-rows dump — already produces). `readSince(wm)` then prunes at
  * the PARTITION level and reads only days newer than the watermark:
  * O(delta) files opened, independent of table size.
  *
  * Contract with the stages (`FlatObs.incremental` et al.): a feed row
  * need only SEED key sets — every group rebuild re-reads the snapshot
  * source-of-truth, and every time predicate is re-applied on the feed —
  * so the feed may over-approximate freely (stale row versions, repeated
  * appends, extra rows are all harmless). It must never MISS a row whose
  * latest change is newer than the oldest stage watermark.
  */
object ChangeFeed {

  val PartitionCol = "change_day"

  /** Append `df`'s rows to the feed under their latest-modification day.
    * `dateCols` are the columns that can carry a modification time
    * (e.g. obs: date_created, date_voided; encounter: date_created,
    * date_changed); `greatest` skips NULLs, and date_created is never
    * NULL, so every row lands in exactly one day partition. A production
    * deployment appends each captured row VERSION as it changes; tests
    * and the bench bootstrap the feed from a snapshot, which yields the
    * same read-side behavior (each row under its latest change day).
    */
  def append(df: DataFrame, path: String, dateCols: Seq[String]): Unit =
    df.withColumn(PartitionCol, to_date(greatest(dateCols.map(col): _*)))
      // co-locate each day's rows before the write: without it every
      // shuffle task writes a sliver into every day partition (tasks ×
      // days small files), and the reader then pays per-file open cost
      // far above the bytes — the same rule BucketedSink.writeFull
      // documents for buckets
      .repartition(col(PartitionCol))
      .write.partitionBy(PartitionCol).mode("append").parquet(path)

  /** Rows whose latest modification is after `since` — pruned at the
    * DIRECTORY level: one listing of the feed root selects the
    * `change_day=` partitions at-or-after the watermark day, and only
    * those are handed to the reader. `spark.read.parquet(root)` with a
    * partition filter prunes the SCAN the same way but still LISTS every
    * partition directory ever written to build its file index — an
    * O(feed history) constant per call that this path avoids; the >= at
    * day granularity over-approximates the `> since` timestamp cut and
    * the stages re-apply the exact predicates. */
  def readSince(spark: SparkSession, path: String, since: Timestamp): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // partition values were written by to_date(timestamp) in the SESSION
    // timezone — derive the cutoff day in the same zone, not the driver
    // JVM default (a JVM zone east of the session zone would land sinceDay
    // one day LATE and the prune would silently drop the partition holding
    // rows just above the watermark — exactly the missed-delta class the
    // contract above forbids)
    val sessionZone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val sinceDay = since.toInstant.atZone(sessionZone).toLocalDate
    val partitions = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(s"$PartitionCol="))
    def dayOf(p: org.apache.hadoop.fs.Path) =
      java.time.LocalDate.parse(p.getName.stripPrefix(s"$PartitionCol="))
    val selected = partitions.filter(p => !dayOf(p).isBefore(sinceDay))
    if (selected.isEmpty) {
      // empty selection needs only the SCHEMA — take it from the single
      // newest partition directory instead of read(path), which lists
      // every day partition ever written to build a file index that
      // limit(0) then discards (the O(feed history) constant this rewrite
      // exists to avoid); an entirely empty feed falls back to the full
      // read, which is then trivially cheap
      val newest = partitions.sortBy(dayOf).lastOption
      newest.fold(spark.read.parquet(path).limit(0).drop(PartitionCol)) { p =>
        spark.read.option("basePath", path).parquet(p.toString)
          .limit(0).drop(PartitionCol)
      }
    } else
      spark.read.option("basePath", path)
        .parquet(selected.map(_.toString).toIndexedSeq: _*)
        .drop(PartitionCol)
  }
}
