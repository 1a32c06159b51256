package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch, relational form: token frequencies over a corpus too
  * large to hold exact per-token counts (the 100 TB question "how often
  * does this n-gram appear" behind contamination screens, boilerplate
  * thresholds, and stop-list mining).
  *
  * The sketch is a (depth x width) counter grid: each occurrence
  * increments one slot per depth row, chosen by an md5 hash salted with
  * the depth index. Estimates read the MINIMUM of a token's depth slots —
  * always >= the true count (counters only ever overestimate, by other
  * tokens colliding into the same slot), with the classic (eps, delta)
  * bound: width w bounds the overestimate by eps*N for eps = e/w at
  * confidence 1 - exp(-depth).
  *
  * Scale shape: building is explode + groupBy(depth, slot) — map-side
  * combinable, one shuffle of at most depth*width rows out of each
  * partition regardless of corpus size; the finished sketch is
  * depth*width rows total (broadcastable), and two sketches MERGE by
  * adding slot-wise (counters are additive), so per-day sketches
  * union+sum into per-month ones without touching the corpus again. The
  * md5 slot hash is engine-portable, so an external engine replays the
  * sketch bit-for-bit (q81's oracle does).
  */
object FrequencySketch {

  /** Slot index of `token` in depth row `d`. */
  def slot(token: Column, d: Int, width: Int): Column =
    Curation.samplingBucket(token, width, salt = s"cm$d|")

  /** Build the sketch from one row per token OCCURRENCE: returns
    * (depth, slot, n) — at most depth*width rows. */
  def countMinBuild(occurrences: DataFrame, token: Column, width: Int, depth: Int): DataFrame =
    occurrences
      .select(posexplode(array((0 until depth).map(d => slot(token, d, width)): _*)))
      .select(col("pos").cast("int").as("depth"), col("col").as("slot"))
      .groupBy("depth", "slot")
      .agg(count(lit(1)).as("n"))

  /** Merge sketches built with the same (width, depth): slot-wise sum. */
  def countMinMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("depth", "slot")
      .agg(sum(col("n")).as("n"))

  /** Point estimates for `queries` (one row per distinct token in column
    * `token`): min over depth rows of the token's slot counters. The
    * sketch is depth*width rows → broadcast; a token absent from every
    * slot estimates 0 (its slots were never incremented).
    */
  def countMinEstimate(
      sketch: DataFrame,
      queries: DataFrame,
      token: Column,
      width: Int,
      depth: Int): DataFrame =
    queries
      .withColumn("__tok", token)
      .select(col("*"), posexplode(
        array((0 until depth).map(d => slot(col("__tok"), d, width)): _*)))
      .withColumnRenamed("pos", "depth").withColumnRenamed("col", "slot")
      .withColumn("depth", col("depth").cast("int"))
      .join(broadcast(sketch), Seq("depth", "slot"), "left")
      .groupBy("__tok")
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
      .withColumnRenamed("__tok", "token")

  // ---- HyperLogLog distinct estimation, relational form ----
  // The mergeable cardinality sketch behind "how many distinct
  // users/URLs/n-grams" at 100 TB: m = 2^p registers, each holding the
  // max leading-zero rank of the keys hashing into it. Register
  // maintenance is groupBy(register).max — map-side combinable, at most
  // m rows leave any partition regardless of input size, and two
  // sketches merge by slot-wise max. Everything is md5 + integer bit
  // arithmetic + ONE final division, so an external engine replays the
  // estimate bit-for-bit: the harmonic denominator sum(2^-M_j) is kept
  // as the EXACT integer sum(2^(52-M_j)) (every register row fits, the
  // total fits a BIGINT), deferring floating point to the last divide.

  /** Per-(group, register) max rank: the sketch state. 60-bit md5 hash:
    * top p bits pick the register, rank = leading zeros of the
    * remaining (60-p) bits + 1 (computed via the binary-string length,
    * which both engines expose as `bin`). */
  def hllRegisters(df: DataFrame, group: Column, key: Column, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p in [4,16], got $p")
    val w = 60 - p // rank window width
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val reg = shiftright(h, w)
    val rest = h.bitwiseAND(lit((1L << w) - 1))
    val rank = when(rest === 0, w + 1).otherwise(lit(w + 1) - length(bin(rest)))
    df.filter(key.isNotNull)
      .select(group.as("g"), reg.cast("int").as("register"), rank.cast("int").as("rank"))
      .groupBy("g", "register").agg(max(col("rank")).as("m"))
  }

  /** Cardinality estimate per group: raw HLL with the standard alpha_m
    * bias constant, linear-counting fallback for the small range
    * (E <= 2.5m with empty registers). Returns (g, n_registers_used,
    * harmonic_sum [exact integer], estimate [rounded 6dp]). */
  def hllEstimate(df: DataFrame, group: Column, key: Column, p: Int = 9): DataFrame = {
    val m = 1 << p
    val w = 60 - p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // exact-integer harmonic parts: present registers contribute
    // 2^(52-min(M,52)); absent registers contribute 2^52 each
    val regs = hllRegisters(df, group, key, p)
      .groupBy("g").agg(
        count(lit(1)).cast("long").as("m_used"),
        // functions.shiftleft only takes a literal shift; the SQL form
        // accepts a column (exact power-of-two longs, no fp on the path)
        sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - least(m, 52))"))
          .as("s_present"))
    regs.select(
        col("g"), col("m_used"),
        (col("s_present") + (lit(m.toLong) - col("m_used")) * lit(1L << 52))
          .as("harmonic_sum"))
      .withColumn("raw",
        lit(alpha * m.toDouble * m.toDouble * math.pow(2.0, 52)) / col("harmonic_sum"))
      .withColumn("zeros", lit(m.toLong) - col("m_used"))
      .withColumn("estimate", round(
        when(col("zeros") > 0 && col("raw") <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")), 6))
      .select(col("g"), col("m_used").as("n_registers_used"),
        col("harmonic_sum"), col("estimate"))
  }
}
