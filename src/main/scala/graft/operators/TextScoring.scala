package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Model-pluggable scoring contract for the text pipeline: language ID is
  * `text → struct<lang, score>`, token budgeting is `text → int` — and
  * every caller (quality filters, mixture rates, packing) composes these
  * as Columns, so swapping the deterministic stand-ins for a real model
  * scorer is a constructor argument, not a pipeline rewrite.
  *
  * Defaults are the engine's deterministic, oracle-checkable stand-ins
  * (marker-word argmax, BPE-ish regex budget). [[FunctionLangId]] /
  * [[FunctionTokenCounter]] adapt any JVM scalar function — the shape an
  * ONNX/JNI model wrapper exports — at the cost of leaving whole-stage
  * codegen for that one column (unavoidable for any black-box model; the
  * surrounding plan is unaffected).
  */
object TextScoring {

  /** text → struct<lang: string, score: double>. */
  trait LangId extends Serializable {
    def apply(text: Column): Column
  }

  /** text → token count (int). */
  trait TokenCounter extends Serializable {
    def apply(text: Column): Column
  }

  /** Deterministic default: marker-word argmax ([[TextAnalysis.langId]]
    * semantics — ties to the lexicographically last code, zero hits →
    * "und" with score 0), score = marker hits. Pure Catalyst columns,
    * codegen'd. */
  final class MarkerLangId(markers: Seq[(String, Seq[String])]) extends LangId {
    def apply(text: Column): Column = {
      val best = try_element_at(
        transform(array(TextAnalysis.words(TextAnalysis.normalize(text))), w => {
          val scored = markers.map { case (langCode, ms) =>
            struct(size(filter(w, x => x.isInCollection(ms))).as("score"),
              lit(langCode).as("lang"))
          }
          array_max(array(scored: _*))
        }),
        lit(1))
      struct(
        when(best.getField("score") === 0, "und")
          .otherwise(best.getField("lang")).as("lang"),
        best.getField("score").cast("double").as("score"))
    }
  }

  /** Deterministic default token budget ([[TextAnalysis.tokenCountBpeish]]). */
  object BpeishTokenCounter extends TokenCounter {
    def apply(text: Column): Column = TextAnalysis.tokenCountBpeish(text)
  }

  /** A plain-JVM marker-argmax scorer function — the stand-in for the
    * ONNX/JNI model call a production [[FunctionLangId]] would wrap.
    * Semantics mirror [[MarkerLangId]] exactly (normalize, count marker
    * hits, argmax with ties to the lexicographically last code, zero
    * hits → "und"/0), so swapping the codegen'd column for this UDF is
    * oracle-checkable end-to-end (q84 runs q37's exact DuckDB oracle
    * against it). */
  def markerModelFunction(
      markers: Seq[(String, Seq[String])]): String => (String, Double) = {
    val sets = markers.map { case (l, ms) => (l, ms.toSet) }
    text => {
      val norm = text.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim
      val ws = if (norm.isEmpty) Array.empty[String] else norm.split(" ")
      val (score, lang) = sets
        .map { case (l, set) => (ws.count(set), l) }
        .maxBy { case (n, l) => (n, l) } // ties → lexicographically last
      if (score == 0) ("und", 0.0) else (lang, score.toDouble)
    }
  }

  /** Adapter for a model-backed scorer: any `String => (lang, score)`
    * function — e.g. a fastText/CLD3-style classifier behind a JNI or
    * ONNX runtime call. Runs as a scalar UDF (one JVM call per row,
    * batched by the executor). */
  final class FunctionLangId(f: String => (String, Double)) extends LangId {
    def apply(text: Column): Column = {
      val u = udf((s: String) =>
        if (s == null) LangScore("und", 0.0)
        else { val (l, sc) = f(s); LangScore(l, sc) })
      u(text)
    }
  }

  /** Adapter for a model tokenizer's count: any `String => Int`. */
  final class FunctionTokenCounter(f: String => Int) extends TokenCounter {
    def apply(text: Column): Column = {
      val u = udf((s: String) => if (s == null) 0 else f(s))
      u(text)
    }
  }
}

/** Top-level for the UDF encoder: struct<lang, score>. */
case class LangScore(lang: String, score: Double)
