package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class GroupConcatAggSpec extends SparkSuite {

  test("GroupConcatAgg matches the Catalyst composition on multi-partition data") {
    import spark.implicits._
    val df = (1 to 500).map { i =>
      (i % 7, (i * 37) % 100, s"v${(i * 13) % 50}")
    }.toDF("g", "k", "v").repartition(8)
    val a = df.groupBy("g").agg(
      GroupConcatAgg(col("v"), Seq(col("k"), col("v")), " ## ", 100000, distinct = false)
        .as("s"))
    val b = df.groupBy("g").agg(
      MysqlFunctions.groupConcat(col("v"), Seq(col("k"), col("v"))).as("s"))
    val av = a.orderBy("g").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val bv = b.orderBy("g").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(av == bv)
  }

  test("GroupConcatAgg distinct + MySQL truncation semantics") {
    import spark.implicits._
    val df = Seq((1, 2, "bb"), (1, 1, "aa"), (1, 3, "bb"), (1, 0, "cc"))
      .toDF("g", "k", "v")
    val out = df.groupBy("g").agg(
      GroupConcatAgg(col("v"), Seq(col("k")), " ## ", 8, distinct = true).as("s"))
      .collect()(0).getString(1)
    // sorted by k: cc, aa, bb, bb → distinct: cc, aa, bb → joined then cut at 8
    assert(out == "cc ## aa")
  }

  test("truncation counts UTF-8 bytes and never splits a code point") {
    import spark.implicits._
    // "é" is 2 bytes, "日" is 3 bytes in UTF-8. MySQL's group_concat_max_len
    // counts bytes; cutting mid-code-point is not allowed.
    val df = Seq((1, 1, "ééé"), (1, 2, "日日日")).toDF("g", "k", "v")
    def cutAt(maxLen: Int): String =
      df.groupBy("g").agg(
        GroupConcatAgg(col("v"), Seq(col("k")), "##", maxLen, distinct = false).as("s"))
        .collect()(0).getString(1)
    // full string = "ééé##日日日" = 6 + 2 + 9 = 17 bytes
    assert(cutAt(17) == "ééé##日日日")
    assert(cutAt(16) == "ééé##日日")  // 14 bytes; byte 16 would split 日 #3
    assert(cutAt(11) == "ééé##日")    // byte 11 exactly ends 日 #1
    assert(cutAt(10) == "ééé##")      // bytes 9-10 are inside 日 #1
    assert(cutAt(7) == "ééé#")        // ASCII separator cuts cleanly
    assert(cutAt(5) == "éé")          // byte 5 is inside é #3
    assert(cutAt(3) == "é")           // byte 3 would split é #2
  }

  test("hot group: buffer stays bounded, output identical to the unbounded result") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String

    val n = 200000
    val maxLen = 1000
    // drive the aggregate directly so the buffer is observable: one
    // pathological group of 200k rows, inserted in DESCENDING key order
    // (every insert sorts before everything kept so far — the worst case
    // for a prefix-keeping compactor)
    def run(distinct: Boolean): (String, Int) = {
      val agg = GroupConcatAgg(
        BoundReference(0, StringType, nullable = true),
        BoundReference(1, IntegerType, nullable = false),
        ", ", maxLen, distinct)
      val buf = agg.createAggregationBuffer()
      var maxSeen = 0
      (n to 1 by -1).foreach { i =>
        // duplicates every other row exercise the distinct dedup path
        val v = UTF8String.fromString(
          "value%09d".format(if (distinct) i / 2 else i))
        agg.update(buf, InternalRow(v, i))
        maxSeen = math.max(maxSeen, buf.rows.length)
      }
      (agg.eval(buf).asInstanceOf[UTF8String].toString, maxSeen)
    }
    val (got, maxSeen) = run(distinct = false)
    // unbounded reference computed independently: sort, join, byte-cut
    val want = (1 to n).map(i => "value%09d".format(i)).mkString(", ").take(maxLen)
    assert(got == want)
    // the buffer must be bounded by the compaction threshold dynamics —
    // far below the 200k rows an unbounded buffer would hold (each kept
    // row costs ~15 value bytes + separator against the 1000-byte cap,
    // so compaction settles near MinCompactAt)
    assert(maxSeen <= 2 * GroupConcatAgg.MinCompactAt,
      s"buffer grew to $maxSeen rows — compaction is not engaging")

    val (gotD, maxSeenD) = run(distinct = true)
    // key order is 1..n; distinct keeps each value's first occurrence
    val wantD = (1 to n).map(i => "value%09d".format(i / 2))
      .distinct.mkString(", ").take(maxLen)
    assert(gotD == wantD)
    assert(maxSeenD <= 2 * GroupConcatAgg.MinCompactAt)
  }

  test("partial-agg lifecycle: serialize/merge keeps buffer AND wire bytes bounded") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String

    // the real executor lifecycle for one hot key: 32 map-side partials
    // of 40k rows each (1.28M rows total), each SERIALIZED (the exchange
    // wire format), deserialized reduce-side, and merged — the peak must
    // be governed by the compaction ceiling at every stage, not by the
    // group size, and the wire bytes must never carry an uncompacted
    // partial
    val maxLen = 1000
    val agg = GroupConcatAgg(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, IntegerType, nullable = false),
      ", ", maxLen, distinct = false)
    var peakRows = 0
    var peakSer = 0
    val nPartials = 32
    val perPartial = 40000
    val partials = (0 until nPartials).map { p =>
      val buf = agg.createAggregationBuffer()
      (0 until perPartial).foreach { j =>
        val i = p * perPartial + j
        agg.update(buf,
          InternalRow(UTF8String.fromString("value%09d".format(i)), i % 1000))
        peakRows = math.max(peakRows, buf.rows.length)
      }
      val ser = agg.serialize(buf)
      peakSer = math.max(peakSer, ser.length)
      ser
    }
    val merged = agg.createAggregationBuffer()
    partials.foreach { ser =>
      agg.merge(merged, agg.deserialize(ser))
      peakRows = math.max(peakRows, merged.rows.length)
    }
    val got = agg.eval(merged).asInstanceOf[UTF8String].toString

    // unbounded reference: full (key, value) sort, join, byte-cut
    val want = (0 until nPartials * perPartial)
      .map(i => (i % 1000, "value%09d".format(i)))
      .sorted.map(_._2).mkString(", ").take(maxLen)
    assert(got == want)

    info(s"peak buffer $peakRows rows; peak serialized partial $peakSer bytes " +
      s"(1.28M-row group, maxLen=$maxLen)")
    // rows: compaction settles the buffer near MinCompactAt however many
    // rows flow through (40k per partial, 1.28M through the merge chain)
    assert(peakRows <= 2 * GroupConcatAgg.MinCompactAt,
      s"peak $peakRows rows — compaction not engaging through merge")
    // wire: a serialized partial is a compacted buffer, NOT the 40k rows
    // it absorbed (~42 bytes/entry x 40k ≈ 1.7 MB unbounded; the ceiling
    // holds it under ~0.5 MB)
    assert(peakSer <= 500000,
      s"peak serialized partial $peakSer bytes — wire carries uncompacted rows")
  }

  test("SQL surface: group_concat coerces non-string value columns") {
    SqlFunctions.register(spark)
    import spark.implicits._
    // the scaladoc's own example shape: an INT value column
    Seq((1, 2, 1065), (1, 1, 6743), (2, 1, 5096)).toDF("g", "k", "c")
      .createOrReplaceTempView("t_int")
    val gc = spark.sql("SELECT g, group_concat(c, k) s FROM t_int GROUP BY g ORDER BY g")
      .collect().map(_.getString(1))
    assert(gc.toSeq == Seq("6743 ## 1065", "5096"))
  }

  test("SQL surface: group_concat / obs_value_for / obs_contains registered") {
    SqlFunctions.register(spark)
    import spark.implicits._
    Seq((1, 10, "x"), (1, 5, "y"), (2, 1, "z")).toDF("g", "k", "v")
      .createOrReplaceTempView("t")
    val gc = spark.sql("SELECT g, group_concat(v, k) s FROM t GROUP BY g ORDER BY g")
      .collect().map(_.getString(1))
    assert(gc.toSeq == Seq("y ## x", "z"))

    Seq("!!6743=72!! ## !!1836=1065!!").toDF("obs").createOrReplaceTempView("o")
    val row = spark.sql(
      "SELECT obs_value_for(obs, 6743) w, obs_contains(obs, 1836, '1065') p FROM o")
      .collect()(0)
    assert(row.getString(0) == "72")
    assert(row.getBoolean(1))
  }
}
