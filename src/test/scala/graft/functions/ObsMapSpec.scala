package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class ObsMapSpec extends SparkSuite {

  test("encode renders sorted boundary entries; decode round-trips") {
    import spark.implicits._
    val df = Seq(
      (1, 1271, Some(5497), "5497"),
      (1, 1271, Some(21), "21"),
      (1, 856, None, "1200"),
      (1, 9002, None, "free = text")) // value containing '='
      .toDF("g", "concept_id", "value_coded", "v")
    val enc = df.groupBy("g")
      .agg(ObsMap.encode(col("concept_id"), col("v"), col("value_coded")).as("obs"))
    val s = enc.collect()(0).getString(1)
    assert(s == "!!856=1200!! ## !!1271=21!! ## !!1271=5497!! ## !!9002=free = text!!")

    val dec = enc.select(ObsMap.decode(col("obs")).as("d"))
      .selectExpr("inline(d)").collect()
    assert(dec.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq(856 -> "1200", 1271 -> "21", 1271 -> "5497", 9002 -> "free = text"))
  }

  test("valuesFor / valueFor / lastValueFor handle repeated concepts") {
    import spark.implicits._
    val df = Seq("!!1271=21!! ## !!1271=5497!! ## !!856=99!!").toDF("obs")
    val row = df.select(
      ObsMap.valuesFor(col("obs"), 1271).as("all"),
      ObsMap.valueFor(col("obs"), 1271).as("first"),
      ObsMap.lastValueFor(col("obs"), 1271).as("last"),
      ObsMap.valueFor(col("obs"), 777).as("missing")).collect()(0)
    assert(row.getSeq[String](0) == Seq("21", "5497"))
    assert(row.getString(1) == "21")
    assert(row.getString(2) == "5497")
    assert(row.isNullAt(3))
  }

  test("containsEntry matches exact concept=code entries only") {
    import spark.implicits._
    val df = Seq("!!1836=1065!! ## !!11836=10655!!").toDF("obs")
    val row = df.select(
      ObsMap.containsEntry(col("obs"), 1836, "1065").as("hit"),
      ObsMap.containsEntry(col("obs"), 1836, "106").as("partial")).collect()(0)
    assert(row.getBoolean(0))
    assert(!row.getBoolean(1))
  }
}
