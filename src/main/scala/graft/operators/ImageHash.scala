package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing for image-level near-duplicate detection —
  * the visual analogue of the SimHash text path ([[Dedup.simhashNearDupPairs]]):
  * decode → thumbnail → difference hash → banded Hamming join.
  *
  * The hash is the public "dHash" (difference hash): resize to a 9x8
  * grayscale thumbnail (nearest-neighbor, [[Multimodal.resizeNearest]]),
  * then one bit per adjacent-pixel comparison — bit (y*8+x) is set iff
  * thumb(y, x) > thumb(y, x+1) unsigned. 64 bits total, invariant to
  * global brightness/contrast shifts that preserve horizontal ordering,
  * which is why it survives re-encodes and small touch-ups that break
  * exact byte hashes.
  *
  * Near-dup discovery is the same LSH discipline as every dedup family
  * here: the 64-bit hash splits into 4 aligned 16-bit bands, images
  * sharing ANY band value become candidates (equi-join on (band, value)
  * — never an all-pairs product), and candidates are verified by exact
  * Hamming distance. Pigeonhole gives TOTAL recall for distance <= 3;
  * larger thresholds are verified correctly but found only when a band
  * survives. At 100 TB the cost is the band shuffle plus bucket-collision
  * verify pairs — O(n) + O(collisions), never O(n^2).
  */
object ImageHash {

  /** dHash fixture corpus: every doc_id % 2 == 0 document becomes a REAL
    * grayscale PNG (deflate-compressed, filter-cycled, CRC'd — the
    * [[Multimodal.pngGray]] codec) with id-derived pixels arranged in
    * near-duplicate GROUPS of four: g = id/8 picks the group (dims and
    * base pattern depend only on g), m = (id%8)/2 the member —
    * m=0 the original, m=1 one perturbed pixel, m=2 two perturbed
    * pixels (both <= a couple of dHash bits away), m=3 a heavy
    * distortion (far away). All arithmetic is integer mod 256, so the
    * DuckDB oracle replays every pixel, the resize, and the packed hash.
    */
  def dhashImagesFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 2 === 0).select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val g = id / 8
        val m = (id % 8) / 2
        val w = (12 + g % 5).toInt
        val h = (10 + g % 4).toInt
        val px = Array.tabulate(w * h) { i =>
          val ix = (i % w).toLong
          val iy = (i / w).toLong
          val base = (37L * g + 5L * ix + 11L * iy +
            41L * (((ix + g) * (iy + 3L)) % 9L)) % 256L
          val v =
            if (m == 3) (base + 89L * ix * iy + 53L) % 256L
            else if (m == 1 && ix == w / 2 && iy == h / 2) (base + 96L) % 256L
            else if (m == 2 && ((ix == w / 3 && iy == h / 3) ||
              (ix == (2 * w) / 3 && iy == (2 * h) / 3))) (base + 96L) % 256L
            else base
          v.toByte
        }
        Multimodal.MediaRow(id, "image", Multimodal.pngGray(w, h, px))
      })
  }

  /** (media_id, dhash): the 64-bit difference hash of each frame's 9x8
    * nearest-neighbor thumbnail. Bit (y*8+x) set iff the thumbnail byte
    * at (y, x) is unsigned-greater than its right neighbor; bit 63 is
    * the Long sign bit (two's complement, which the oracle reproduces
    * with a signed sum). One row per input frame; callers hashing
    * multi-frame media should pick or aggregate frames first.
    */
  def dhash64(frames: Dataset[Multimodal.FrameRow]): DataFrame = {
    import frames.sparkSession.implicits._
    Multimodal.resizeNearest(frames, ow = 9, oh = 8)
      .mapPartitions(_.map { fr =>
        var hsh = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if ((fr.px(y * 9 + x) & 0xff) > (fr.px(y * 9 + x + 1) & 0xff))
              hsh |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (fr.media_id, hsh)
      }).toDF("media_id", "dhash")
  }

  /** Banded Hamming near-dup pairs over 64-bit perceptual hashes:
    * 4 aligned 16-bit bands -> candidate equi-join -> exact Hamming
    * verify. Output (id_a < id_b, hamming <= maxHamming), distinct.
    * Total recall for maxHamming <= 3 (pigeonhole over 4 bands);
    * 16-bit bands keep chance bucket collisions at 2^-16 per pair.
    */
  def nearDupPairs(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3): DataFrame = {
    val s = hashes.select(col(idCol).as("id"), col(hashCol).as("hsh"))
    val bands = s.select(col("id"), col("hsh"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("hsh"), b * 16).bitwiseAND(lit(65535L)).as("bval"))): _*))
          .as("bb"))
      .select(col("id"), col("hsh"), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val l = bands.select(col("band"), col("bval"),
      col("id").as("id_a"), col("hsh").as("h_a"))
    val r = bands.select(col("band"), col("bval"),
      col("id").as("id_b"), col("hsh").as("h_b"))
    l.join(r, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b")
      .distinct() // a pair can match on several bands; verify once
      .withColumn("hamming", TextAnalysis.hamming(col("h_a"), col("h_b")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
