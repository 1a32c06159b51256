package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** dHash contracts the q131/q132 oracles rely on, asserted directly:
  * brightness-shift invariance, the planted-group distance structure
  * (single-pixel perturbations stay within the LSH threshold, the heavy
  * distortion does not), and pigeonhole recall of the banded join.
  */
class ImageHashSpec extends SparkSuite {

  private def fixtureHashes(n: Int): Map[Long, Long] = {
    import spark.implicits._
    val docs = (0L until n.toLong).toDF("doc_id")
    ImageHash.dhash64(
        Multimodal.decodePngFrames(
          ImageHash.dhashImagesFromDocuments(spark, docs)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("planted groups: perturbed members are near, distorted members far") {
    val h = fixtureHashes(64) // ids 0,2,..,62 -> groups 0..7
    for (g <- 0L until 8L) {
      val base = h(g * 8)
      assert(ham(base, h(g * 8 + 2)) <= 2, s"group $g m=1 drifted")
      assert(ham(base, h(g * 8 + 4)) <= 4, s"group $g m=2 drifted")
      // the heavy distortion must not look like a near-dup of its base
      assert(ham(base, h(g * 8 + 6)) > 3, s"group $g m=3 too close")
    }
  }

  test("dHash is invariant to a global brightness shift without wrap") {
    import spark.implicits._
    val w = 12; val hgt = 10
    def png(shift: Int) = Multimodal.pngGray(w, hgt,
      Array.tabulate(w * hgt)(i => ((i * 7) % 100 + shift).toByte))
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png(0)),
      Multimodal.MediaRow(2L, "image", png(40))).toDS()
    val hs = ImageHash.dhash64(Multimodal.decodePngFrames(media))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
  }

  test("banded join finds every pair within Hamming 3 (pigeonhole)") {
    import spark.implicits._
    // hand-built hashes: pairs at distance 0..3 in scattered bit
    // positions (including the sign bit), plus a far pair
    val base = 0x5a5a_1234_8765_cafeL
    val rows = Seq(
      1L -> base,
      2L -> base, // d=0
      3L -> (base ^ (1L << 63)), // d=1, sign bit
      4L -> (base ^ (1L << 5) ^ (1L << 40)), // d=2 across bands
      5L -> (base ^ (1L << 0) ^ (1L << 17) ^ (1L << 34)), // d=3, 3 bands
      6L -> ~base // d=64
    ).toDF("id", "hsh")
    val pairs = ImageHash.nearDupPairs(rows, "id", "hsh", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val within = for {
      a <- 1L to 5L; b <- (a + 1) to 5L
      d = java.lang.Long.bitCount(
        rows.collect().find(_.getLong(0) == a).get.getLong(1) ^
          rows.collect().find(_.getLong(0) == b).get.getLong(1))
      if d <= 3
    } yield (a, b, d)
    assert(pairs == within.toSet)
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("fixture PNGs round-trip through the real codec") {
    import spark.implicits._
    val docs = (0L until 16L).toDF("doc_id")
    val media = ImageHash.dhashImagesFromDocuments(spark, docs)
    val frames = Multimodal.decodePngFrames(media).collect()
    assert(frames.length == 8) // even ids only
    frames.foreach { fr =>
      val g = fr.media_id / 8
      assert(fr.w == 12 + (g % 5).toInt && fr.h == 10 + (g % 4).toInt)
    }
  }
}
