package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The string decode (reference interface) and the typed-map decode
  * (scale path) must be indistinguishable: random obs maps — valid codes,
  * junk values, multi-valued concepts, absent concepts, the 1534 quirk —
  * run through both [[FlatVisitSummary.decodeColumns]] and
  * [[FlatVisitSummary.decodeColumnsTyped]] and every one of the 36
  * decoded columns must match row for row.
  */
class DecodePathEquivalenceSpec extends SparkSuite {

  test("string and typed decode projections agree on fuzzed obs maps") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val concepts = Seq(
      374 -> Seq(190, 6495, 780), 1048 -> Seq(1065, 1066), 1151 -> Seq(5526, 1708),
      1272 -> Seq(1107, 5488, 1167), 1353 -> Seq(1356, 1354), 1363 -> Seq(1065, 1066),
      1565 -> Seq(1427, 92), 1571 -> Seq(628, 6285, 6297), 1836 -> Seq(1065, 6765),
      5271 -> Seq(1065, 1066), 6150 -> Seq(1066, 6183), 6171 -> Seq(1413, 1624),
      6175 -> Seq(1107, 512), 6181 -> Seq(6180, 105), 6758 -> Seq(1447, 6368),
      6760 -> Seq(1384, 1386, 8015), 6761 -> Seq(1385, 1175), 6780 -> Seq(1065, 1175),
      6781 -> Seq(1066, 1175), 6784 -> Seq(1065, 1066), 6785 -> Seq(1066, 1175),
      6794 -> Seq(6790, 1852), 1592 -> Seq(1405), 1534 -> Seq(3, 7),
      1271 -> Seq(5497, 21, 1569, 1883, 5622),
      6743 -> Seq(55, 72), 6744 -> Seq(160, 181),
      6746 -> Seq(20240105, 20240230), 5096 -> Seq(20240207))

    val rows: Seq[(Long, Seq[(Int, String)])] = (1 to 250).map { i =>
      val picked = concepts.filter(_ => rnd.nextDouble() < 0.5).flatMap { case (c, codes) =>
        val nVals = 1 + (if (rnd.nextDouble() < 0.3) 1 else 0) // sometimes multi-valued
        (0 until nVals).map { _ =>
          val v =
            if (rnd.nextDouble() < 0.7) codes(rnd.nextInt(codes.size)).toString
            else if (c == 6746 || c == 5096) "2024-01-15" // date-shaped
            else (rnd.nextInt(9000) + 1000).toString // junk code
          c -> v
        }
      }.sortBy { case (c, v) => (c, v) }
      (i.toLong, picked.distinct)
    }

    val df = rows.map { case (id, entries) =>
      val obs = entries.map { case (c, v) => s"!!$c=$v!!" }.mkString(" ## ")
      val m = entries.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      (id, if (obs.isEmpty) null else obs, m)
    }.toDF("id", "obs", "obs_entries")

    val viaString = df.select(col("id") +: FlatVisitSummary.decodeColumns(col("obs")): _*)
    val viaTyped = df.select(col("id") +: FlatVisitSummary.decodeColumnsTyped(col("obs_entries")): _*)
    // the staged form build() actually runs: lookup projection, then chains
    val viaStaged = df
      .select(col("id") +: FlatVisitSummary.typedLookupColumns(col("obs_entries")): _*)
      .select(col("id") +: FlatVisitSummary.decodeColumnsFromLookups: _*)
    // the one-pass custom-Expression path build() defaults to
    val viaExpr = df
      .select(col("id"),
        graft.functions.ObsDecode.decodeAll(col("obs_entries")).as("__dec"))
      .select(col("id") +: FlatVisitSummary.decodeColumnsFromStruct(col("__dec")): _*)
    // the one-pass STRING-input expression (for reference-produced tables)
    val viaStrExpr = df
      .select(col("id"),
        graft.functions.ObsDecode.decodeAllString(col("obs")).as("__dec"))
      .select(col("id") +: FlatVisitSummary.decodeColumnsFromStruct(col("__dec")): _*)
    val a = viaString.orderBy("id").collect().toSeq
    val b = viaTyped.orderBy("id").collect().toSeq
    val c = viaStaged.orderBy("id").collect().toSeq
    val d = viaExpr.orderBy("id").collect().toSeq
    val diffs = a.zip(b).filter { case (x, y) => x != y }
    assert(diffs.isEmpty, s"${diffs.size} typed-differing rows, first: ${diffs.headOption}")
    val diffsS = a.zip(c).filter { case (x, y) => x != y }
    assert(diffsS.isEmpty, s"${diffsS.size} staged-differing rows, first: ${diffsS.headOption}")
    val diffsE = a.zip(d).filter { case (x, y) => x != y }
    assert(diffsE.isEmpty, s"${diffsE.size} expr-differing rows, first: ${diffsE.headOption}")
    val e = viaStrExpr.orderBy("id").collect().toSeq
    val diffsSE = a.zip(e).filter { case (x, y) => x != y }
    assert(diffsSE.isEmpty,
      s"${diffsSE.size} string-expr-differing rows, first: ${diffsSE.headOption}")
    // schema parity: the expression paths must emit the same column names
    assert(viaExpr.columns.toSeq == viaString.columns.toSeq)
    assert(viaStrExpr.columns.toSeq == viaString.columns.toSeq)
  }
}
