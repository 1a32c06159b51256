package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Windowed voice-activity segmentation over decoded PCM — the
  * silence-trim pass a speech-corpus pipeline runs before feature
  * extraction (leading/trailing dead air is storage and compute spent
  * on nothing). Activity is max-|amplitude| per fixed window against an
  * integer threshold: exact, engine-replayable, and the shape every
  * energy-based VAD shares (swap the predicate for a model score and
  * the plumbing stands).
  *
  * Scale shape: per-row work inside mapPartitions — no shuffle, no
  * state, memory bounded by one payload (the codecs' partition-bounded
  * discipline). Quarantine semantics: undecodable payloads contribute
  * nothing.
  */
object AudioActivity {

  /** Per-media activity profile over `winFrames`-sample windows (mono;
    * multi-channel rejects — channel policy is the caller's job, and
    * guessing "average them" would silently halve stereo peaks):
    * n_windows (full windows only; a partial tail is ignored),
    * n_silent, first_active / last_active window index (-1 when all
    * silent), and the exact |amplitude| sum over ALL samples — the
    * checksum that pins the decode, not just the segmentation.
    */
  def extractActivity(
      media: Dataset[Multimodal.MediaRow],
      winFrames: Int,
      threshold: Int): DataFrame = {
    require(winFrames >= 1 && threshold >= 0)
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Multimodal.pcmSamples(r.payload).iterator
        .filter(_._1.channels == 1)
        .map { case (_, samples) =>
          val nWin = samples.length / winFrames
          var sumAbs = 0L
          samples.foreach(a => sumAbs += math.abs(a))
          var nSilent = 0
          var first = -1
          var last = -1
          var wIdx = 0
          while (wIdx < nWin) {
            var peak = 0
            var k = wIdx * winFrames
            val end = k + winFrames
            while (k < end) {
              val ab = math.abs(samples(k))
              if (ab > peak) peak = ab
              k += 1
            }
            if (peak < threshold) nSilent += 1
            else {
              if (first < 0) first = wIdx
              last = wIdx
            }
            wIdx += 1
          }
          (r.media_id, nWin, nSilent, first, last, sumAbs)
        }
    }).toDF("media_id", "n_windows", "n_silent", "first_active",
      "last_active", "sum_abs")
  }

  /** VAD fixture corpus (doc_id % 3 == 1): mono 16-bit PCM with an
    * id-derived silence/activity layout — L = 2 + id%4 silent lead
    * windows, A = 3 + id%5 active windows, T = 1 + id%3 silent tail
    * windows of 50 frames each. Active frame i (global index) carries
    * amplitude ((id + 31i) mod 256 − 128) · 256; silent frames are
    * exactly zero. The oracle replays both the segmentation counts AND
    * the |amplitude| checksum from this arithmetic. */
  def vadWavFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val win = 50
        val lead = (2 + id % 4).toInt * win
        val active = (3 + id % 5).toInt * win
        val tail = (1 + id % 3).toInt * win
        val n = lead + active + tail
        val out = Multimodal.wavBytes(rate = 8000, channels = 1, bits = 16, nSamples = n)
        var i = lead
        while (i < lead + active) {
          val a = ((((id + 31L * i) % 256) - 128) * 256).toInt
          val off = 44 + i * 2
          out(off) = a.toByte; out(off + 1) = (a >> 8).toByte
          i += 1
        }
        Multimodal.MediaRow(id, "audio", out)
      })
  }

  /** Per-frame feature extraction over decoded PCM — the grain an audio
    * ML pipeline actually trains on: for each full `winFrames`-sample
    * frame, the peak |amplitude|, the exact |amplitude| and squared
    * sums (energy in integer form — callers divide/sqrt downstream so
    * nothing here needs a float tolerance), and the zero-crossing count
    * (adjacent-sample sign changes WITHIN the frame — the cheap
    * voicing/noisiness discriminator). Same mapPartitions shape and
    * quarantine semantics as [[extractActivity]]; a partial tail frame
    * is ignored, matching the VAD's full-windows-only contract.
    */
  def extractFrameFeatures(
      media: Dataset[Multimodal.MediaRow],
      winFrames: Int): DataFrame = {
    require(winFrames >= 1)
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Multimodal.pcmSamples(r.payload).iterator
        .filter(_._1.channels == 1)
        .flatMap { case (_, samples) =>
          val nWin = samples.length / winFrames
          (0 until nWin).map { f =>
            var peak = 0
            var sumAbs = 0L
            var sumSq = 0L
            var zc = 0
            var k = f * winFrames
            val end = k + winFrames
            while (k < end) {
              val x = samples(k)
              val ab = math.abs(x)
              if (ab > peak) peak = ab
              sumAbs += ab
              sumSq += x.toLong * x
              if (k > f * winFrames) {
                val p = samples(k - 1)
                if ((p < 0 && x >= 0) || (p >= 0 && x < 0)) zc += 1
              }
              k += 1
            }
            (r.media_id, f, peak, sumAbs, sumSq, zc)
          }
        }
    }).toDF("media_id", "frame_idx", "peak", "sum_abs", "sum_sq",
      "n_zero_cross")
  }
}
