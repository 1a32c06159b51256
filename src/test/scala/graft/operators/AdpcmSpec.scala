package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AdpcmSpec extends AnyFunSuite {

  private def reference(samples: Array[Int], spb: Int): Array[Int] = {
    // independent replay of the encoder+decoder lockstep, block by block
    val out = new Array[Int](samples.length)
    var s = 0
    while (s < samples.length) {
      var pred = samples(s); var idx = 0
      out(s) = pred; s += 1
      var k = 1
      while (k < spb && s < samples.length) {
        val (_, p2, i2) = Adpcm.encodeStep(pred, idx, samples(s))
        pred = p2; idx = i2
        out(s) = pred; s += 1
        k += 1
      }
    }
    out
  }

  test("decode(encode(s)) equals the state-machine reconstruction exactly") {
    val rnd = new scala.util.Random(9)
    for (n <- Seq(1, 64, 65, 66, 200)) { // below/at/past the block boundary
      val samples = Array.tabulate(n)(i =>
        math.max(-32768, math.min(32767,
          (math.sin(i / 7.0) * 12000).toInt + rnd.nextInt(900) - 450)))
      val wav = Adpcm.encode(samples, rate = 8000)
      val (rate, got) = Adpcm.decode(wav).get
      assert(rate == 8000 && got.length == n)
      assert(got.toSeq == reference(samples, spb = 65).toSeq, s"n=$n")
    }
  }

  test("reconstruction tracks a smooth source within adaptive-step error") {
    val samples = Array.tabulate(300)(i => (math.sin(i / 10.0) * 8000).toInt)
    val (_, got) = Adpcm.decode(Adpcm.encode(samples, 8000)).get
    // every block seeds from a RAW sample (error exactly 0 there), then
    // pays an attack transient while the step re-adapts from 7; past it
    // the quantizer locks on and the steady error stays far below the
    // 16000 signal swing
    samples.indices.filter(_ % 65 == 0).foreach(i =>
      assert(samples(i) == got(i), s"block seed at $i must be lossless"))
    val steady = samples.indices.filter(_ % 65 >= 8)
      .map(i => math.abs(samples(i) - got(i)))
    assert(steady.max < 1500, s"max steady-state error ${steady.max}")
  }

  test("off-contract payloads decode to None, never garbage") {
    val good = Adpcm.encode(Array.tabulate(100)(i => i * 37 % 3000), 8000)
    assert(Adpcm.decode(good).isDefined)
    // a linear-PCM WAV is not ADPCM
    assert(Adpcm.decode(Multimodal.wavTone(1L, 8000, 1, 16, 50)).isEmpty)
    // stereo flag
    val st = good.clone(); st(22) = 2
    assert(Adpcm.decode(st).isEmpty)
    // header step index out of [0, 88]
    val badIdx = good.clone(); badIdx(62) = 90.toByte
    assert(Adpcm.decode(badIdx).isEmpty)
    // fact chunk promising more samples than the data holds
    val over = good.clone(); over(48) = 0xff.toByte; over(49) = 0xff.toByte
    assert(Adpcm.decode(over).isEmpty)
    // truncated data
    assert(Adpcm.decode(good.take(good.length - 8)).isEmpty)
    // hostile fact count: a CRC-free format, so the allocation cap is
    // the only defense against a gigabyte ask
    val bomb = good.clone()
    bomb(48) = 0xff.toByte; bomb(49) = 0xff.toByte
    bomb(50) = 0xff.toByte; bomb(51) = 0x7f.toByte
    assert(Adpcm.decode(bomb).isEmpty)
    // a fact chunk declaring 0 samples: encode's require() can never
    // emit it, so decode must reject rather than return (rate, empty)
    val zero = good.clone()
    zero(48) = 0; zero(49) = 0; zero(50) = 0; zero(51) = 0
    assert(Adpcm.decode(zero).isEmpty)
    // not a WAV
    assert(Adpcm.decode("RIFFjunk".getBytes("US-ASCII")).isEmpty)
    assert(Adpcm.decode(Array.emptyByteArray).isEmpty)
  }
}
