package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (point-in-time) join: for each left row, attach the payload of
  * the nearest right row for the same key — the "latest prior reading"
  * pattern (latest lab result before a visit, last known price before a
  * trade) and its forward/nearest duals (next purchase after a click,
  * closest sensor sample to an event).
  *
  * Spark has no ASOF JOIN; the naive forms are a correlated subquery per
  * row or a range join + per-left-row max — both quadratic in rows per
  * key. This is the scalable formulation: tag the two inputs, UNION them,
  * and take a running `last_value(payload) IGNORE NULLS` over each key's
  * event-time order. ONE shuffle by key, linear scan within key, no
  * join at all — the plan a native engine's ASOF operator would produce.
  * `nearest` adds a second window over the same partitioning (opposite
  * sort order), so it costs one extra in-partition sort, still zero
  * joins and one shuffle. At 100 TB the shuffle is keyed by the join key
  * (uniform for user-like keys); a pathologically hot key is a salting
  * candidate, but as-of semantics then need per-salt boundary stitching —
  * keep hot keys whole.
  *
  * Tie semantics: a right row at exactly left.ts IS visible in every
  * direction (<= / >=), which the sort encodes by ordering right (side 0)
  * before left (side 1) at equal ts; among equal-ts right rows the
  * highest `seq` wins backward and the lowest wins forward (mirror
  * images) — pass a unique id to make both deterministic. For `nearest`,
  * an exact distance tie resolves backward, and a backward match at
  * distance 0 (right row exactly at left.ts) wins outright. The payload
  * travels inside a struct so a right row whose payload is genuinely
  * NULL still matches (IGNORE NULLS skips missing rows, not null
  * values).
  *
  * `tolerance` (optional) bounds the allowed |left.ts - right.ts| in the
  * native units of `ts`: microseconds for timestamp columns, the column's
  * own units for numerics. A match farther than the bound yields a null
  * payload, exactly like no match — pandas `merge_asof(tolerance=...)`
  * semantics.
  */
object AsOfJoin {

  /** left/right must both have columns `key` and `ts`; `payload` names a
    * right column to carry; `seq` is a right column breaking equal-ts
    * ties. Returns every left row + `payload` (null when no right row
    * qualifies). `direction`: "backward" (default — most recent right row
    * at or before left.ts), "forward" (earliest at or after), "nearest"
    * (closer of the two). `tolerance`: max allowed distance (see above).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: String,
      seq: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq
    val rowType = left.select(struct(leftCols.map(col): _*).as("r")).schema("r").dataType

    // numeric image of ts for tolerance / nearest distance math; the
    // windows sort by the original ts column, so this never reorders
    def tsNum(c: Column, dt: DataType): Column = dt match {
      case TimestampType => unix_micros(c)
      case TimestampNTZType =>
        // field extraction on NTZ never consults the session time zone,
        // unlike cast-to-TimestampType, whose offset distorts tolerance /
        // nearest distances across a DST transition in non-UTC sessions
        unix_date(c.cast(DateType)).cast(LongType) * lit(86400000000L) +
          hour(c).cast(LongType) * lit(3600000000L) +
          minute(c).cast(LongType) * lit(60000000L) +
          (date_part(lit("SECOND"), c) * lit(1000000L)).cast(LongType)
      case DateType =>
        // same reasoning as NTZ: a cast through TimestampType lands on
        // session-local midnight, so day distances straddling a DST
        // transition read 23h/25h; day arithmetic is time-zone-free
        unix_date(c).cast(LongType) * lit(86400000000L)
      case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
      case _ => c.cast(DoubleType)
    }
    val lTsType = left.schema(ts).dataType
    val rTsType = right.schema(ts).dataType

    val pType = right
      .select(struct(col(payload).as("v"), tsNum(col(ts), rTsType).as("t")).as("p"))
      .schema("p").dataType
    val l = left.select(
      col(key), col(ts), lit(1).as("__side"), lit(null).cast("long").as("__seq"),
      lit(null).cast(pType).as("__p"),
      struct(leftCols.map(col): _*).as("__row"))
    val r = right.select(
      col(key), col(ts), lit(0).as("__side"), col(seq).cast("long").as("__seq"),
      struct(col(payload).as("v"), tsNum(col(ts), rTsType).as("t")).as("__p"),
      lit(null).cast(rowType).as("__row"))
    val u = l.unionByName(r)

    // backward: ascending scan — the last right row at or before each left
    // row. forward: descending scan (rights at equal ts still first, lowest
    // seq last so it wins) — the first right row at or after.
    val wBwd = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("__side").asc, col("__seq").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val lt = tsNum(col(ts), lTsType)
    // distance-gate a candidate struct; tolerance null-safe: no bound → pass
    def gate(cand: Column, dist: Column): Column = tolerance match {
      case Some(tol) => when(cand.isNotNull && dist <= lit(tol), cand)
      case None => cand
    }

    val matched = direction match {
      case "backward" =>
        u.withColumn("__m", gate(last(col("__p"), ignoreNulls = true).over(wBwd),
          lt - last(col("__p"), ignoreNulls = true).over(wBwd).getField("t")))
      case "forward" =>
        u.withColumn("__m", gate(last(col("__p"), ignoreNulls = true).over(wFwd),
          last(col("__p"), ignoreNulls = true).over(wFwd).getField("t") - lt))
      case "nearest" =>
        val b = last(col("__p"), ignoreNulls = true).over(wBwd)
        val f = last(col("__p"), ignoreNulls = true).over(wFwd)
        u.withColumn("__b", gate(b, lt - b.getField("t")))
          .withColumn("__f", gate(f, f.getField("t") - lt))
          .withColumn("__m",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              // exact-distance ties resolve backward (<=)
              .when(lt - col("__b.t") <= col("__f.t") - lt, col("__b"))
              .otherwise(col("__f")))
    }
    matched
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) :+
        col("__m.v").as(payload): _*)
  }
}
