package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md):
  * `region nation customer supplier part orders lineitem events documents
  * embeddings`, one parquet per table under the scale-factor dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses natively;
    // read it as a nanos long and convert. Integer DIV, not `/`: the double
    // path loses precision above 2^53 (epoch-nanos ≈ 1.7e18).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
    // Fixtures written by non-Spark tools (pyarrow, DuckDB, pandas) mark
    // parquet timestamps isAdjustedToUTC=0, which Spark 4 surfaces as
    // TIMESTAMP_NTZ — a type `unix_micros` and streaming `withWatermark`
    // both reject. The session TZ is pinned UTC everywhere in this repo,
    // so casting NTZ -> TIMESTAMP preserves every instant exactly.
    df.schema.fields.collect { case f if f.dataType == TimestampNTZType => f.name }
      .foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }
}
