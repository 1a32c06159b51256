package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SkewSpec extends SparkSuite {

  test("saltedSortedAgg equals unsalted collect+sort on a hot key") {
    import spark.implicits._
    val df = ((1 to 900).map(i => ("hot", i)) ++ Seq(("cold", 1), ("cold", 2)))
      .toDF("k", "v")
    val entry = struct(col("v"))
    val salted = Skew.saltedSortedAgg(df, Seq("k"), entry, saltBuckets = 8)
      .select(col("k"), transform(col("sorted_entries"), _.getField("v")).as("vs"))
    val plain = df.groupBy("k")
      .agg(sort_array(collect_list(entry)).as("e"))
      .select(col("k"), transform(col("e"), _.getField("v")).as("vs"))
    val a = salted.orderBy("k").as[(String, Seq[Int])].collect().toSeq
    val b = plain.orderBy("k").as[(String, Seq[Int])].collect().toSeq
    assert(a == b)
  }

  test("saltedJoin matches plain join results") {
    import spark.implicits._
    val big = (1 to 500).map(i => (i % 3, i)).toDF("key", "payload")
    val dim = Seq((0, "a"), (1, "b"), (2, "c"), (9, "unused")).toDF("key", "label")
    val salted = Skew.saltedJoin(big, dim, "key", 4)
      .select("key", "payload", "label")
    val plain = big.join(dim, Seq("key")).select("key", "payload", "label")
    assert(salted.orderBy("key", "payload").collect().toSeq ==
      plain.orderBy("key", "payload").collect().toSeq)
  }
}
