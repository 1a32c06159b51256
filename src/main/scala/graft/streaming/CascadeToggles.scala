package graft.streaming

import org.apache.spark.sql.SparkSession

/** The cascade's two A/B instrumentation toggles — PROFILING KNOBS, NOT
  * USER CONFIGURATION (round-12 documentation ask: these exist so
  * `graft.tools.ProfileCascade` can price the r9-retained O(delta)
  * components against their r8 forms in one JVM, the SCALE.md round-11
  * #1 methodology; flipping them in production only re-enables the
  * measured-slower shapes):
  *
  *  - [[QueueCheckpoint]] — `false` reverts the O(delta) queue frame
  *    from localCheckpoint() to the r8 cache() form (lineage kept, the
  *    ~4.4 MB/tick re-open cost returns);
  *  - [[PrunedPurgeProbe]] — `false` reverts the purged-version probe
  *    to the r8 full-log scan.
  *
  * Default is ON (the shipped shape): an UNSET key means the fast path;
  * only the literal string "false" (or any non-"true" value) flips a
  * component, so no deployment can drift off the shipped shape by
  * omission. CascadeTogglesSpec pins this default. */
object CascadeToggles {
  val QueueCheckpoint = "graft.cascade.queueCheckpoint"
  val PrunedPurgeProbe = "graft.cascade.prunedPurgeProbe"

  /** Default-on read: unset -> true; anything but "true" -> false. */
  def on(spark: SparkSession, key: String): Boolean =
    spark.conf.getOption(key).forall(_ == "true")
}
