package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional LAYOUT operator
  * for data skipping. Sorting a table by one column gives perfect
  * min/max pruning on that column and none on any other; interleaving
  * the bits of several columns into one sort key gives each dimension
  * ~w/d useful bits of locality, so a predicate box on ANY clustered
  * dimension prunes most files' min/max ranges. This is how large lake
  * tables (Delta/Iceberg OPTIMIZE ZORDER) keep 100 TB scans from
  * opening every file; here it's the same recipe on plain parquet:
  * compute the key, `repartitionByRange` + sort on it, and let the
  * writer's per-file column stats carry the pruning.
  *
  * The key is a pure codegen'd column expression (shifts/masks — no
  * UDF), so it rides inside whole-stage codegen and pushes nothing
  * off the fast path.
  */
object Zorder {

  /** Interleave the low `bits` bits of each (non-negative) column:
    * dimension d's bit i lands at position i * n + d. With two 16-bit
    * dims the key fits in 32 bits of a Long. Values are masked to
    * `bits` first — callers map their domain into the budget (scale,
    * bucket, or clamp) the way any Z-order implementation must.
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits >= 1 && dims.size * bits <= 63,
      s"need 1+ dims and dims*bits <= 63, got ${dims.size} x $bits")
    val n = dims.size
    val terms = for {
      (d, di) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftright(d.cast("long"), i).bitwiseAND(lit(1L)) *
      lit(1L << (i * n + di))
    terms.reduce(_ + _)
  }

  /** Cluster `df` into `nRanges` contiguous Z-ranges, sorted within
    * each — one output file per range under a direct parquet write.
    * The z column is dropped from the result (it's layout, not data).
    */
  def clusterByZ(df: DataFrame, dims: Seq[Column], bits: Int, nRanges: Int): DataFrame = {
    val keyed = df.withColumn("__z", zValue(dims, bits))
    keyed.repartitionByRange(nRanges, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Per-partition min/max envelope of each dim — the file-level stats a
    * parquet footer would carry, surfaced for pruning measurements:
    * a partition can be skipped for a box predicate iff its envelope
    * misses the box on some dimension. Output one row per partition:
    * (partition_id, dim index, min, max).
    */
  def partitionEnvelopes(df: DataFrame, dims: Seq[Column]): DataFrame = {
    val named = df.select(dims.zipWithIndex.map { case (d, i) =>
      d.cast("long").as(s"d$i")
    }: _*)
    val aggs = dims.indices.flatMap(i =>
      Seq(min(col(s"d$i")).as(s"min$i"), max(col(s"d$i")).as(s"max$i")))
    named
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg(aggs.head, aggs.tail: _*)
  }
}
