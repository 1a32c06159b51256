package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class NfcExpressionSpec extends SparkSuite {

  private def jdkNfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  test("composes combining sequences; idempotent; precomposed unchanged") {
    import spark.implicits._
    val cases = Seq(
      1L -> "café", // e + combining acute -> precomposed é
      2L -> "café", // already NFC
      3L -> "Ångström", // two marks in one string
      4L -> "ȫ", // stacked marks -> single codepoint U+022B
      5L -> "plain ascii")
    val got = cases.toDF("id", "s")
      .select(col("id"), NfcExpression.nfc(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, s) =>
      assert(got(id) == jdkNfc(s), s"case $id")
    }
    assert(got(1L) == "café" && got(4L) == "ȫ")
    // nulls pass through; idempotence is a fixpoint
    val extra = Seq((6L, null.asInstanceOf[String])).toDF("id", "s")
    assert(extra.select(NfcExpression.nfc(col("s"))).collect()(0).isNullAt(0))
    val twice = cases.toDF("id", "s")
      .select((NfcExpression.nfc(NfcExpression.nfc(col("s"))) ===
        NfcExpression.nfc(col("s"))).as("eq")).collect()
    assert(twice.forall(_.getBoolean(0)))
  }

  test("interpreted eval matches codegen (whole-stage off)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val s = "x́y Å"
      val got = Seq(s).toDF("s")
        .select(NfcExpression.nfc(col("s"))).collect()(0).getString(0)
      assert(got == jdkNfc(s))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
