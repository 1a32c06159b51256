package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class BucketingSpec extends SparkSuite {

  test("bucketed-by-key tables sort-merge-join without a shuffle exchange") {
    import spark.implicits._
    val li = (1 to 2000).map(i => (i % 400, i, i * 2.0)).toDF("k", "line", "qty")
    val o = (0 until 400).map(i => (i, s"o$i")).toDF("k", "label")

    Bucketing.writeBucketed(li, "li_bucketed", "k", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "k", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), Seq("k"))
      assert(joined.count() == 2000)
      assert(Bucketing.isShuffleFree(joined),
        s"expected no Exchange:\n${joined.queryExecution.executedPlan}")

      // contrast: the same join on unbucketed data DOES shuffle
      val unbucketed = li.join(o, Seq("k"))
      unbucketed.count()
      assert(!Bucketing.isShuffleFree(unbucketed))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
