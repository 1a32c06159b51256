package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RobustStatsSpec extends SparkSuite {
  import spark.implicits._

  test("median/MAD are the exact lower order statistics; gate flags the tail") {
    // values 1..9 plus one extreme outlier: median of 10 values is the
    // LOWER order statistic (rank floor(9*0.5)=4, 0-based) = 5;
    // deviations |v-5| = 4,3,2,1,0,1,2,3,4,9995 → mad = lower median = 2
    // devs sorted: 0,1,1,2,2,3,3,4,4,9995 → mad = 2, threshold 6 —
    // exactly one row (the planted 10000, dev 9995) exceeds it
    val df = ((1 to 9) :+ 10000).map(v => ("g", v.toLong)).toDF("k", "v")
    val out = RobustStats.madOutlierSummary(df, col("k"), col("v"), k = 3)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("g", 10L, 1L, 5L, 2L)))
    val gated = RobustStats.madGate(df, col("k"), col("v"), k = 3)
      .as[(String, Long)].collect().map(_._2).sorted
    assert(gated.forall(v => math.abs(v - 5) <= 6))
    assert(!gated.contains(10000L))
  }

  test("mean-based z-score breaks where the MAD gate does not") {
    // one huge outlier drags the mean so far every inlier is >1 sigma
    // from it on the wrong side; the median moves one rank at most.
    val df = ((1 to 99).map(_.toLong) :+ 1000000L).map(("g", _)).toDF("k", "v")
    val out = RobustStats.madOutlierSummary(df, col("k"), col("v"), k = 3)
      .as[(String, Long, Long, Long, Long)].head()
    val (_, n, outliers, med, mad) = out
    assert(n == 100L && med == 50L && mad == 25L)
    assert(outliers == 1L) // exactly the planted extreme
  }

  test("integer domain end-to-end: no float appears in med/mad/threshold") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 7L))
      .toDF("k", "v")
    val out = RobustStats.madOutlierSummary(df, col("k"), col("v"))
    val types = out.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("med") == "long" && types("mad") == "long")
    val rows = out.as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    // group b is a singleton: med = its value, mad = 0, no outliers
    assert(rows.last == (("b", 1L, 0L, 7L, 0L)))
  }
}
