package graft

import org.apache.spark.sql.SparkSession
import graft.SparkSuite

/** The extensions deployment path: a session built with
  * `withExtensions(new GraftExtensions)` — the same injection object that
  * `spark.sql.extensions=graft.GraftExtensions` resolves via reflection —
  * has the engine's SQL surface with no register() call. Uses
  * `builder.create()` (a fresh session on the shared context) so the
  * shared suite session and the global active/default session state are
  * untouched — suites run in parallel in one JVM, and `create()` does not
  * read the conf-string extension list.
  */
class GraftExtensionsSpec extends SparkSuite {

  test("GraftExtensions injection provides group_concat / obs-map functions") {
    spark.sparkContext // ensure the shared context exists first
    // the conf-string path instantiates the class by name; prove that works
    val byName = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val s2 = SparkSession.builder()
      .master("local[2]").appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(byName)
      .create()
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
  }
}
