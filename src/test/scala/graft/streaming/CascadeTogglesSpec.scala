package graft.streaming

import graft.SparkSuite

/** Pins the round-12 documentation contract: the two cascade A/B
  * instrumentation keys are DEFAULT-ON (the shipped fast shape) — an
  * unset key can never drift a deployment onto the measured-slower r8
  * forms; only an explicit non-"true" value flips a component, and
  * that is a profiling action (graft.tools.ProfileCascade), not
  * configuration. */
class CascadeTogglesSpec extends SparkSuite {

  test("both toggles default ON in a fresh session") {
    Seq(CascadeToggles.QueueCheckpoint, CascadeToggles.PrunedPurgeProbe)
      .foreach { key =>
        spark.conf.unset(key)
        assert(CascadeToggles.on(spark, key), s"$key must default on")
      }
  }

  test("only an explicit non-true value flips a component") {
    val key = CascadeToggles.QueueCheckpoint
    try {
      spark.conf.set(key, "true")
      assert(CascadeToggles.on(spark, key))
      spark.conf.set(key, "false")
      assert(!CascadeToggles.on(spark, key))
      // any other string is also OFF — a typo cannot silently pass for
      // the shipped shape, it reads as the profiling override it is
      spark.conf.set(key, "TRUE")
      assert(!CascadeToggles.on(spark, key))
    } finally spark.conf.unset(key)
  }
}
