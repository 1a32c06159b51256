package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** HyperLogLog distinct estimation: accuracy in the standard-error
  * regime, the linear-counting small range, and the sketch-merge
  * property (slot-wise max of two register sets == registers of the
  * union) that makes per-shard sketches combinable without re-reading
  * data. */
class HllSpec extends SparkSuite {

  test("estimate lands within the expected error of exact distinct") {
    import spark.implicits._
    // three groups with known cardinalities spanning both regimes
    val rows =
      (1 to 20000).map(i => ("big", s"u$i")) ++
        (1 to 5000).map(i => ("mid", s"v${i % 2500}")) ++ // 2500 distinct
        (1 to 300).map(i => ("small", s"w${i % 120}")) // linear-counting range
    val df = rows.toDF("g", "k")
    val est = FrequencySketch.hllEstimate(df, col("g"), col("k"), p = 9)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // sigma ~= 1.04/sqrt(512) ~= 4.6%; assert within 4 sigma
    assert(math.abs(est("big") - 20000) / 20000 < 0.20, s"big=${est("big")}")
    assert(math.abs(est("mid") - 2500) / 2500 < 0.20, s"mid=${est("mid")}")
    // the small group sits squarely in linear counting: much tighter
    assert(math.abs(est("small") - 120) / 120 < 0.10, s"small=${est("small")}")
  }

  test("sketches merge by slot-wise max") {
    import spark.implicits._
    val a = (1 to 4000).map(i => ("g", s"x$i")).toDF("g", "k")
    val b = (2000 to 6000).map(i => ("g", s"x$i")).toDF("g", "k")
    val merged = FrequencySketch.hllRegisters(a, col("g"), col("k"), 9)
      .unionByName(FrequencySketch.hllRegisters(b, col("g"), col("k"), 9))
      .groupBy("g", "register").agg(max("m").as("m"))
      .orderBy("register").collect().toSeq
    val direct = FrequencySketch.hllRegisters(
        a.unionByName(b), col("g"), col("k"), 9)
      .orderBy("register").collect().toSeq
    assert(merged == direct)
  }
}
