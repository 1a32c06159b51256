package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AudioFeaturesSpec extends SparkSuite {
  import spark.implicits._

  private def wav(samples: Seq[Int]): Array[Byte] = {
    val out = Multimodal.wavBytes(rate = 8000, channels = 1, bits = 16,
      nSamples = samples.length)
    samples.zipWithIndex.foreach { case (a, i) =>
      out(44 + i * 2) = a.toByte
      out(44 + i * 2 + 1) = (a >> 8).toByte
    }
    out
  }

  test("per-frame peak/sums/zero-crossings are exact; tail frame ignored") {
    // frame size 4: frame0 = 100,-200,300,-400 (3 crossings),
    // frame1 = 0,0,-1,1 (2 crossings: 0 -> -1 and -1 -> 1; 0 -> 0 none),
    // then a 2-sample partial tail that must NOT appear
    val s = Seq(100, -200, 300, -400, 0, 0, -1, 1, 7, 7)
    val media = Seq(Multimodal.MediaRow(1L, "audio", wav(s))).toDS()
    val rows = AudioActivity.extractFrameFeatures(media, winFrames = 4)
      .orderBy("frame_idx")
      .as[(Long, Int, Int, Long, Long, Int)].collect().toSeq
    assert(rows == Seq(
      (1L, 0, 400, 1000L, 100L * 100 + 200L * 200 + 300L * 300 + 400L * 400, 3),
      (1L, 1, 1, 2L, 2L, 2)))
  }

  test("a crossing at a frame boundary is not counted (within-frame only)") {
    val s = Seq(5, 5, -5, -5) // one crossing, at index 1->2
    val media = Seq(Multimodal.MediaRow(2L, "audio", wav(s))).toDS()
    val rows = AudioActivity.extractFrameFeatures(media, winFrames = 2)
      .orderBy("frame_idx")
      .select(col("n_zero_cross")).as[Int].collect().toSeq
    assert(rows == Seq(0, 0)) // the 5 -> -5 flip straddles the boundary
  }
}
