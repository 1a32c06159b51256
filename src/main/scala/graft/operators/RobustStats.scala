package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics: median / MAD (median absolute
  * deviation) and the k·MAD gate — the curation filter that survives the
  * heavy-tailed score distributions a mean/stddev z-score is wrecked by
  * (one 10 MB boilerplate document moves a group's mean arbitrarily; it
  * moves the median by at most one rank).
  *
  * Medians are the EXACT lower order statistic at rank
  * floor((n-1)/2) — the q144 definition, chosen over interpolating
  * medians because it stays in the value domain (integer in → integer
  * out), so med, dev, and the 3·MAD threshold compare exactly across
  * engines with no float tolerance anywhere.
  *
  * Shape: two ranked window passes (values, then absolute deviations),
  * each one shuffle keyed by the group; the per-group (median, mad) frame
  * is one row per group, so AQE converts the final gate join to a
  * runtime broadcast whenever the group count is small (no forced hint —
  * a per-domain key at web scale can have millions of groups, where the
  * shuffle join is the right plan). At 100 TB the exact
  * rank sort is the honest cost; when a group outgrows a task sort, the
  * histogram sketch (q151) substitutes at bounded error, same shape.
  */
object RobustStats {

  private def groupMedian(df: DataFrame, key: String, v: String,
      out: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(v)
    df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(key)))
      .groupBy(key)
      .agg(max(when(col("rn") - 1 === floor((col("n") - 1) * lit(0.5)),
        col(v))).as(out))
  }

  /** Per-group summary: n_rows, n_outliers (|v − med| > k·mad), med, mad. */
  def madOutlierSummary(
      df: DataFrame,
      key: Column,
      value: Column,
      k: Int = 3): DataFrame = {
    val t = df.select(key.as("key"), value.as("v"))
    val med = groupMedian(t, "key", "v", "med")
    val dev = t.join(med, Seq("key"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = groupMedian(dev.select(col("key"), col("dev")),
      "key", "dev", "mad")
    dev.join(mad, Seq("key"))
      .groupBy(col("key"), col("med"), col("mad"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("dev") > lit(k) * col("mad"), 1).otherwise(0))
          .cast("long").as("n_outliers"))
      .select(col("key"), col("n_rows"), col("n_outliers"),
        col("med"), col("mad"))
  }

  /** Row-level gate: keep rows within k·MAD of their group median. */
  def madGate(df: DataFrame, key: Column, value: Column, k: Int = 3)
      : DataFrame = {
    val t = df.withColumn("__key", key).withColumn("__v", value)
    val med = groupMedian(
      t.select(col("__key").as("key"), col("__v").as("v")), "key", "v", "med")
    val mad = groupMedian(
      t.select(col("__key").as("key"), col("__v").as("v"))
        .join(med, Seq("key"))
        .withColumn("dev", abs(col("v") - col("med")))
        .select(col("key"), col("dev")),
      "key", "dev", "mad")
    t.join(med.join(mad, Seq("key")),
        t("__key") === col("key"))
      .filter(abs(col("__v") - col("med")) <= lit(k) * col("mad"))
      .drop("key", "med", "mad", "__key", "__v")
  }
}
