package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst Expression — the first
  * pass a multilingual corpus pipeline runs before ANY text hashing:
  * "café" typed with a combining acute and "café" typed precomposed are
  * different byte strings (different md5s, different shingles, different
  * dedup verdicts) until canonical composition folds them together.
  *
  * Spark ships no Unicode-normalization function, and a Scala UDF here
  * would box every row; this expression stays inside whole-stage codegen
  * and calls the JDK's `java.text.Normalizer` (ICU-grade, in every JVM)
  * directly. DuckDB's `nfc_normalize` implements the same canonical
  * composition, which is what makes the q154 oracle replayable.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcExpression {
  /** Column surface for [[NfcNormalizeExpr]]. */
  def nfc(c: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(c)))
}
