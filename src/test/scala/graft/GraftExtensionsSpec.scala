package graft

import org.apache.spark.sql.SparkSession
import graft.SparkSuite

/** The config-level deployment path: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` has the engine's SQL
  * surface with no register() call.
  */
class GraftExtensionsSpec extends SparkSuite {

  test("spark.sql.extensions injects group_concat / obs-map functions") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session on the shared context, extensions resolved from conf
      val s2 = SparkSession.builder()
        .master("local[2]").appName("graft-ext-test")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s2.implicits._
      Seq((1, 2, 7001), (1, 1, 7002)).toDF("g", "k", "c")
        .createOrReplaceTempView("ext_t")
      val gc = s2.sql("SELECT group_concat(c, k) s FROM ext_t GROUP BY g")
        .collect()(0).getString(0)
      assert(gc == "7002 ## 7001")
      Seq("!!6743=81!!").toDF("obs").createOrReplaceTempView("ext_o")
      assert(s2.sql("SELECT obs_value_for(obs, 6743) FROM ext_o")
        .collect()(0).getString(0) == "81")
      assert(s2.sql("SELECT obs_contains(obs, 6743, '81') FROM ext_o")
        .collect()(0).getBoolean(0))
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
