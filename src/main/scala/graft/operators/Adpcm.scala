package graft.operators

/** IMA ADPCM (DVI4) — the first STATEFUL audio codec in the family: each
  * 4-bit nibble's meaning depends on the (predictor, step-index) state
  * threaded through every prior sample, unlike the memoryless PCM and
  * G.711 maps. This is the WAV format tag 0x11 layout real telephony and
  * game audio uses: fixed-size blocks, each headed by a raw 16-bit
  * predictor seed + step index, then two samples per data byte (low
  * nibble first).
  *
  * Every step is integer arithmetic (table lookups, shifts, clamps), so
  * an external engine replays the encoder AND decoder exactly — the
  * property the q123 oracle checks with a recursive CTE. Blocks are
  * deliberately independent (the step index resets with each block
  * header) so replay recursion is per block, and a damaged block loses
  * itself, not the stream.
  *
  * Same reject-don't-guess contract as the other codecs: wrong tag,
  * depth, channel count, header step index out of [0,88], truncated
  * blocks, or a missing fact chunk all decode to None.
  */
object Adpcm {

  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Decoder state transition: (pred, idx) + nibble → (pred', idx').
    * pred' IS the reconstructed sample. */
  def decodeStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val step = StepTable(idx)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p = if ((nibble & 8) != 0) pred - diff else pred + diff
    (math.max(-32768, math.min(32767, p)),
      math.max(0, math.min(88, idx + IndexTable(nibble))))
  }

  /** Encoder step: quantize (sample - pred) against the current step,
    * then advance through [[decodeStep]] — the encoder's state IS the
    * decoder's reconstruction, which is what keeps the two in lockstep. */
  def encodeStep(pred: Int, idx: Int, sample: Int): (Int, Int, Int) = {
    val step = StepTable(idx)
    var diff = sample - pred
    var nibble = 0
    if (diff < 0) { nibble = 8; diff = -diff }
    if (diff >= step) { nibble |= 4; diff -= step }
    if (diff >= (step >> 1)) { nibble |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) nibble |= 1
    val (p2, i2) = decodeStep(pred, idx, nibble)
    (nibble, p2, i2)
  }

  /** Encode mono 16-bit samples as a WAV (format tag 0x11): fmt chunk
    * with cbSize=2 + wSamplesPerBlock, a fact chunk carrying the exact
    * sample count, and `blockAlign`-byte blocks — 4-byte header (raw
    * predictor int16 LE, step index byte, reserved 0) + nibble data,
    * low nibble first. The step index resets to 0 at each block. */
  def encode(samples: Array[Int], rate: Int, blockAlign: Int = 36): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign must be >= 8 and word-aligned, got $blockAlign")
    require(samples.nonEmpty, "empty streams are not encodable")
    require(samples.forall(s => s >= -32768 && s <= 32767),
      "samples must fit 16 bits")
    val spb = (blockAlign - 4) * 2 + 1 // samples per full block
    val nBlocks = (samples.length + spb - 1) / spb
    val dataLen = nBlocks * blockAlign
    val out = new Array[Byte](12 + 8 + 20 + 8 + 4 + 8 + dataLen)
    def put(i: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, i)
    def le32(i: Int, v: Long): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def le16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    put(0, "RIFF"); le32(4, out.length - 8L); put(8, "WAVE")
    put(12, "fmt "); le32(16, 20); le16(20, 0x11) // IMA ADPCM
    le16(22, 1); le32(24, rate)
    le32(28, rate.toLong * blockAlign / spb) // approx byte rate
    le16(32, blockAlign); le16(34, 4) // bits per sample
    le16(36, 2); le16(38, spb) // cbSize, wSamplesPerBlock
    put(40, "fact"); le32(44, 4); le32(48, samples.length.toLong)
    put(52, "data"); le32(56, dataLen)
    var s = 0
    var b = 0
    while (b < nBlocks) {
      val off = 60 + b * blockAlign
      var pred = samples(s)
      var idx = 0
      le16(off, pred); out(off + 2) = idx.toByte; out(off + 3) = 0
      s += 1
      var k = 0
      while (k < (blockAlign - 4) * 2) {
        val nib =
          if (s < samples.length) {
            val (n, p2, i2) = encodeStep(pred, idx, samples(s))
            pred = p2; idx = i2; s += 1
            n
          } else 0 // pad nibbles beyond the fact count are ignored
        val at = off + 4 + (k >> 1)
        if ((k & 1) == 0) out(at) = nib.toByte // low nibble first
        else out(at) = (out(at) | (nib << 4)).toByte
        k += 1
      }
      b += 1
    }
    out
  }

  /** Decode a mono IMA-ADPCM WAV to (rate, samples), or None for
    * anything off contract. */
  def decode(p: Array[Byte]): Option[(Int, Array[Int])] = {
    if (p.length < 12 || new String(p, 0, 4, "US-ASCII") != "RIFF" ||
      new String(p, 8, 4, "US-ASCII") != "WAVE") return None
    def le32(i: Int): Long = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    var i = 12
    var rate = -1; var blockAlign = -1; var spb = -1
    var nSamples = -1L
    var dataOff = -1; var dataLen = 0L
    while (i + 8 <= p.length) {
      val id = new String(p, i, 4, "US-ASCII")
      val len = le32(i + 4)
      id match {
        case "fmt " if rate < 0 =>
          if (len < 20 || i + 8 + 20 > p.length) return None
          if (le16(i + 8) != 0x11) return None // not IMA ADPCM
          if (le16(i + 10) != 1) return None // mono contract
          rate = le32(i + 12).toInt
          blockAlign = le16(i + 20)
          if (le16(i + 22) != 4) return None // 4-bit nibbles only
          if (le16(i + 24) != 2) return None // cbSize
          spb = le16(i + 26)
          if (blockAlign < 8 || spb != (blockAlign - 4) * 2 + 1) return None
        case "fact" =>
          if (len < 4 || i + 12 > p.length) return None
          nSamples = le32(i + 8)
        case "data" => dataOff = i + 8; dataLen = len
        case _ => ()
      }
      val next = i.toLong + 8L + len + (len & 1L)
      i = if (next <= i || next > Int.MaxValue) p.length else next.toInt
    }
    if (rate < 0 || dataOff < 0 || nSamples < 0) return None
    // reject-don't-guess: encode's require() never emits 0 samples or a
    // non-word-aligned block, so a stream declaring either is off contract
    if (nSamples == 0 || blockAlign % 4 != 0) return None
    if (nSamples > (1L << 26)) return None // hostile-header allocation cap
    if (dataOff + dataLen > p.length) return None
    val nBlocks = (nSamples + spb - 1) / spb
    if (nBlocks * blockAlign > dataLen) return None // truncated data
    val out = new Array[Int](nSamples.toInt)
    var s = 0
    var b = 0
    while (b < nBlocks) {
      val off = dataOff + b * blockAlign
      var pred = (le16(off) << 16) >> 16 // sign-extend
      var idx = p(off + 2) & 0xff
      if (idx > 88) return None
      out(s) = pred; s += 1
      var k = 0
      while (k < (blockAlign - 4) * 2 && s < nSamples) {
        val byte = p(off + 4 + (k >> 1)) & 0xff
        val nib = if ((k & 1) == 0) byte & 0x0f else byte >> 4
        val (p2, i2) = decodeStep(pred, idx, nib)
        pred = p2; idx = i2
        out(s) = pred; s += 1
        k += 1
      }
      b += 1
    }
    if (s != nSamples) return None
    Some((rate, out))
  }
}
