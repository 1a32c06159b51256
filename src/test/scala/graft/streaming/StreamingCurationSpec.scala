package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite
import graft.operators.{Curation, TextAnalysis}

/** The stateless curation/text operators (md5 sampling, upsampling,
  * chunking, scrubbing, quality metrics) are pure per-row projections —
  * this spec pins that they run UNCHANGED on a stream and emit exactly
  * the batch result, which is what makes the curation pipeline reusable
  * for continuous ingestion. (packSequences and the dedup family are
  * deliberately batch: they need corpus-wide order/state.)
  */
case class Doc(doc_id: Long, text: String, lang: String)

class StreamingCurationSpec extends SparkSuite {

  test("stratified sample + upsample + chunk on a stream equal the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (1 to 300).map(i =>
      Doc(i.toLong, s"doc $i ${"lorem ipsum " * (i % 9)}", if (i % 3 == 0) "en" else "de"))

    def curate(df: org.apache.spark.sql.DataFrame) = {
      val sampled = Curation.stratifiedSample(df, col("lang"), col("doc_id"),
        Map("en" -> 0.4), defaultRate = 0.9, salt = "s1")
      val weighted = Curation.upsample(sampled, col("doc_id"),
        when(col("lang") === "de", 1.5).otherwise(1.0))
      Curation.chunk(weighted, TextAnalysis.scrubPii(col("text")), 50, 10)
        .select("doc_id", "copy_idx", "chunk_idx", "chunk_text")
    }

    val input = MemoryStream[Doc]
    val q = curate(input.toDF()).writeStream.format("memory")
      .queryName("curated").outputMode(OutputMode.Append()).start()
    docs.grouped(100).foreach { batch => input.addData(batch); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("curated")
      .as[(Long, Int, Int, String)].collect().sorted.toSeq
    val batch = curate(docs.toDF())
      .as[(Long, Int, Int, String)].collect().sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }
}
