package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization — the WordPiece/BPE
  * INFERENCE pattern as a relational operator. Training a merge table is
  * offline work; what a 100 TB curation pipeline runs per document is
  * the deterministic greedy segmentation against a broadcast vocabulary,
  * and that is what sequence packing (token budgets) and token-count
  * stats should be measured in — not whitespace words.
  *
  * Semantics: scan the (normalized, `[a-z0-9 ]`) text left to right; at
  * each position emit the LONGEST vocabulary piece prefixing the
  * remainder, falling back to the single character; spaces delimit (no
  * piece crosses or includes a space) and emit nothing. Deterministic —
  * two distinct pieces of equal length cannot both prefix the same
  * position — so an external engine can replay the identical token
  * stream from the same vocabulary (the q126 DuckDB oracle does, via a
  * recursive CTE over distinct words).
  *
  * The vocabulary rides in the plan as a reference object: a per-first-
  * character candidate table, each bucket sorted by length descending,
  * so the scan probes only pieces that can possibly match. The
  * expression compiles to a single static-shaped call (no boxing, no
  * HOF lambda interpretation) and stays inside whole-stage codegen.
  */
final class SubwordVocab(val pieces: Seq[String]) extends Serializable {
  require(pieces.nonEmpty && pieces.forall(p =>
    p.nonEmpty && p.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))),
    "vocab pieces must be non-empty lowercase-alphanumeric strings")

  // candidates by first char, longest first — rebuilt on deserialization
  @transient private lazy val byFirst: Array[Array[String]] = {
    val table = new Array[Array[String]](128)
    pieces.distinct.groupBy(_.charAt(0)).foreach { case (c, ps) =>
      table(c.toInt) = ps.sortBy(p => (-p.length, p)).toArray
    }
    table
  }

  /** Tokenize one normalized string; spaces emit nothing. */
  def tokenize(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    val n = s.length
    while (pos < n) {
      val c = s.charAt(pos)
      if (c == ' ') pos += 1
      else {
        var matched: String = null
        if (c < 128) {
          val cands = byFirst(c.toInt)
          if (cands != null) {
            var i = 0
            while (i < cands.length && matched == null) {
              val p = cands(i)
              if (pos + p.length <= n && s.startsWith(p, pos)) matched = p
              i += 1
            }
          }
        }
        if (matched == null) {
          out += s.substring(pos, pos + 1)
          pos += 1
        } else {
          out += matched
          pos += matched.length
        }
      }
    }
    out.toArray
  }

  /** The codegen entry point: UTF8String in, Catalyst array out. */
  def tokenizeData(s: UTF8String): GenericArrayData =
    new GenericArrayData(
      tokenize(s.toString).map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
}

object SubwordVocab {
  /** A small public-knowledge English subword vocabulary: frequent
    * function words, common prefixes/suffixes/morphemes, digraphs, and
    * digit runs — enough structure that greedy segmentation behaves
    * like a real tokenizer's budget (multi-char pieces dominate), small
    * enough that the DuckDB oracle carries it as a VALUES list.
    */
  val Default: Seq[String] = Seq(
    "the", "and", "ing", "ion", "tion", "ation", "ed", "er", "est", "ly",
    "ment", "ness", "able", "ible", "ous", "ful", "less", "un", "re",
    "in", "dis", "en", "non", "over", "under", "out", "up", "anti", "de",
    "pre", "pro", "con", "com", "ex", "sub", "inter", "trans", "per",
    "for", "of", "to", "is", "it", "on", "at", "as", "an", "or", "be",
    "by", "we", "he", "so", "no", "do", "if", "my", "me", "all", "are",
    "was", "were", "with", "that", "this", "from", "have", "has", "had",
    "not", "but", "what", "when", "where", "which", "who", "will",
    "would", "there", "their", "they", "them", "then", "than", "these",
    "those", "some", "such", "can", "could", "should", "about", "into",
    "more", "most", "other", "time", "year", "day", "man", "way",
    "thing", "world", "life", "hand", "part", "place", "work", "week",
    "case", "point", "company", "number", "group", "fact", "000", "00",
    "19", "20", "qu", "th", "ch", "sh", "ph", "wh", "ck", "ng", "nt",
    "st", "nd", "ll", "ss", "ee", "oo", "ea", "ou", "ai", "ie")

  val default = new SubwordVocab(Default)

  /** The oracle-side rendering of a vocabulary: a SQL VALUES list, built
    * from the SAME Seq the expression uses so the two can never drift. */
  def sqlValues(vocab: SubwordVocab = default): String =
    vocab.pieces.map(p => s"('$p')").mkString(", ")
}

case class SubwordTokenizeExpr(child: Expression, vocab: SubwordVocab)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    vocab.tokenizeData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordVocab", vocab, classOf[SubwordVocab].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.tokenizeData($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordTokenizeExpr =
    copy(child = newChild)
  override def prettyName: String = "subword_tokenize"
}

object SubwordTokenizer {
  /** Token array of a NORMALIZED ([a-z0-9 ]) text column. */
  def tokens(norm: Column, vocab: SubwordVocab = SubwordVocab.default): Column =
    GraftColumnBridge.column(
      SubwordTokenizeExpr(GraftColumnBridge.expression(norm), vocab))
}
