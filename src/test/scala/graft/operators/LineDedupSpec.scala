package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Edge semantics of [[Dedup.dedupLines]] and [[Dedup.duplicatedSpans]]
  * that the q98/q101 fixtures cannot isolate: keep-first vs drop-all,
  * within-doc duplicates, all-lines-dropped docs, empty text, and the
  * within-doc repeat counting of the span signal.
  */
class LineDedupSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "text")
  }

  test("keep-first retains exactly the global min (doc,pos) copy") {
    val df = docs(
      1L -> "header\nalpha beta\nfooter",
      2L -> "header\ngamma delta\nfooter",
      3L -> "header\nheader\nepsilon")
    val out = Dedup.dedupLines(df, "id", col("text")).orderBy("id").collect()
    // doc 1 owns the first "header" (1,0) and "footer" (1,2)
    assert(out(0).getString(1) == "header\nalpha beta\nfooter")
    assert(out(1).getString(1) == "gamma delta")
    // doc 3's TWO headers both lose to (1,0) — within-doc copies drop too
    assert(out(2).getString(1) == "epsilon")
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((3L, 3L), (3L, 1L), (3L, 1L)))
  }

  test("drop-all removes every copy of a repeated line") {
    val df = docs(
      1L -> "shared\nunique one",
      2L -> "shared\nunique two")
    val out = Dedup.dedupLines(df, "id", col("text"), keepFirst = false)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "unique one")
    assert(out(1).getString(1) == "unique two")
  }

  test("a doc whose every line is dropped yields empty text, n_kept 0") {
    val df = docs(
      1L -> "only\nlines",
      2L -> "only\nlines")
    val out = Dedup.dedupLines(df, "id", col("text"), keepFirst = false)
      .orderBy("id").collect()
    assert(out.forall(_.getString(1) == ""))
    assert(out.forall(_.getLong(3) == 0L))
    // and the doc row itself survives (left join, not inner)
    assert(out.length == 2)
  }

  test("empty text is one empty line and dedups like any line") {
    val df = docs(1L -> "", 2L -> "", 3L -> "real line")
    val out = Dedup.dedupLines(df, "id", col("text")).orderBy("id").collect()
    // doc 1 keeps the canonical empty line; doc 2's copy drops
    assert(out(0).getString(1) == "" && out(0).getLong(3) == 1L)
    assert(out(1).getString(1) == "" && out(1).getLong(3) == 0L)
    assert(out(2).getString(1) == "real line")
  }

  test("duplicatedSpans counts within-doc repeats as duplication") {
    import spark.implicits._
    // doc 1: "a b a b a" → 3-grams: "a b a", "b a b", "a b a" — the
    // repeated gram marks 2 of 3 instances duplicated
    val df = Seq((1L, Seq("a b a", "b a b", "a b a"))).toDF("id", "grams")
    val out = Dedup.duplicatedSpans(df, "id", col("grams")).collect()(0)
    assert(out.getLong(1) == 3L && out.getLong(2) == 2L)
    assert(math.abs(out.getDouble(3) - 0.666667) < 1e-6)
  }
}
