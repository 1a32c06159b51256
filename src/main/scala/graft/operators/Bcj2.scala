package graft.operators

/** BCJ2 — 7-Zip's FOUR-STREAM x86 branch converter, the filter 7-Zip
  * prefers over plain BCJ for large executables (reference habitat:
  * `.7z` folders with coder id `03 03 01 1B`; the reference engine's
  * ingest never sees it because MySQL never does — this is part of the
  * 100 TB-corpus surface, same family as [[Bcj]]).
  *
  * Unlike the in-place BCJ filters, BCJ2 SPLITS the data: `main`
  * carries every byte except converted branch operands, `call` the
  * absolute targets of converted E8 CALLs (big-endian), `jump` those
  * of converted E9 JMPs and 0F 8x Jcc's, and `rc` a binary
  * range-coded bit per candidate saying whether it was converted.
  * The range coder is the LZMA shift-low machinery (11-bit
  * probabilities, move 5, top 2^24) over 2+256 contexts: [0] for
  * Jcc, [1] for E9, [2+prevByte] for E8 — the published layout of the
  * public 7z format description's BCJ2 section.
  *
  * Decode walk: copy `main` bytes; at each candidate byte b
  * (b ∈ {E8, E9} or prev = 0F with (b & F0) = 80) decode one bit; on
  * 1, read the 4-byte big-endian absolute from `call`/`jump`, write
  * `dest − (pos + 4)` little-endian, and continue after the operand
  * (its last byte becomes `prev`). Reject-don't-guess throughout:
  * truncated/surplus streams, an operand past the declared output
  * length, and a nonzero first rc byte (the shift-low cache is always
  * 0, as in every LZMA-family encoder) all quarantine by name.
  *
  * The encoder exists for FIXTURES (the Cfb/Rar mold: spec-faithful
  * in-house writer, cross-checked against the REAL reader on this
  * system — libarchive's bsdtar reads BCJ2 7z archives): it converts
  * every candidate whose 4-byte operand fits, which is a valid
  * encoder choice because the rc stream records each decision.
  */
object Bcj2 {

  final case class Streams(
      main: Array[Byte],
      call: Array[Byte],
      jump: Array[Byte],
      rc: Array[Byte])

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val KTop = 1L << 24
  private val KBits = 11
  private val KInitProb = 1 << 10 // kBitModelTotal / 2
  private val NumProbs = 2 + 256

  private def probIndex(b: Int, prev: Int): Int =
    if (b == 0xE8) 2 + prev else if (b == 0xE9) 1 else 0

  private def isCandidate(b: Int, prev: Int): Boolean =
    (b & 0xFE) == 0xE8 || (prev == 0x0F && (b & 0xF0) == 0x80)

  /** Split `data` into the four BCJ2 streams. Every candidate gets one
    * rc bit; conversion happens whenever the full 4-byte operand is
    * inside the block. */
  def encode(data: Array[Byte]): Streams = {
    val main = new java.io.ByteArrayOutputStream()
    val call = new java.io.ByteArrayOutputStream()
    val jump = new java.io.ByteArrayOutputStream()
    val rcOut = new java.io.ByteArrayOutputStream()
    val probs = Array.fill(NumProbs)(KInitProb)

    // ---- LZMA-style range encoder ----------------------------------
    var low = 0L
    var range = 0xFFFFFFFFL
    var cache = 0
    var cacheSize = 1L
    def shiftLow(): Unit = {
      if (low < 0xFF000000L || low > 0xFFFFFFFFL) {
        var temp = cache
        var continue = true
        while (continue) {
          rcOut.write((temp + (low >>> 32)).toInt & 0xff)
          temp = 0xFF
          cacheSize -= 1
          continue = cacheSize != 0
        }
        cache = ((low >>> 24) & 0xff).toInt
      }
      cacheSize += 1
      low = (low << 8) & 0xFFFFFFFFL
    }
    def encodeBit(i: Int, bit: Int): Unit = {
      val bound = (range >>> KBits) * probs(i)
      if (bit == 0) { range = bound; probs(i) += (2048 - probs(i)) >> 5 }
      else { low += bound; range -= bound; probs(i) -= probs(i) >> 5 }
      while (range < KTop) { shiftLow(); range = (range << 8) & 0xFFFFFFFFL }
    }

    var pos = 0
    var prev = 0
    while (pos < data.length) {
      val b = data(pos) & 0xff
      main.write(b)
      pos += 1
      if (isCandidate(b, prev)) {
        val canConvert = pos + 4 <= data.length
        encodeBit(probIndex(b, prev), if (canConvert) 1 else 0)
        if (canConvert) {
          val rel = (data(pos) & 0xffL) | ((data(pos + 1) & 0xffL) << 8) |
            ((data(pos + 2) & 0xffL) << 16) | ((data(pos + 3) & 0xffL) << 24)
          val dest = (rel + pos + 4) & 0xFFFFFFFFL
          val sink = if (b == 0xE8) call else jump
          sink.write(((dest >>> 24) & 0xff).toInt)
          sink.write(((dest >>> 16) & 0xff).toInt)
          sink.write(((dest >>> 8) & 0xff).toInt)
          sink.write((dest & 0xff).toInt)
          pos += 4
          prev = ((dest >>> 24) & 0xff).toInt
        } else prev = b
      } else prev = b
    }
    var k = 0
    while (k < 5) { shiftLow(); k += 1 }
    Streams(main.toByteArray, call.toByteArray, jump.toByteArray,
      rcOut.toByteArray)
  }

  /** Rebuild the original block of `outLen` bytes from the four
    * streams, or a NAMED rejection: `bcj2_rc_truncated`,
    * `bcj2_bad_rc_start`, `bcj2_main_truncated`,
    * `bcj2_call_truncated`, `bcj2_jump_truncated`, `bcj2_overrun`
    * (a converted operand past the declared output),
    * `bcj2_stream_surplus` (bytes a strict walk never consumed). */
  def decode(main: Array[Byte], call: Array[Byte], jump: Array[Byte],
      rc: Array[Byte], outLen: Int): Either[String, Array[Byte]] =
    try {
      if (outLen < 0) bail("bcj2_bad_size")
      val out = new Array[Byte](outLen)
      var rcPos = 0
      def nextRc(): Int = {
        if (rcPos >= rc.length) bail("bcj2_rc_truncated")
        val v = rc(rcPos) & 0xff; rcPos += 1; v
      }
      if (rc.length < 5) bail("bcj2_rc_truncated")
      if (nextRc() != 0) bail("bcj2_bad_rc_start")
      var code = 0L
      var range = 0xFFFFFFFFL
      var k = 0
      while (k < 4) { code = ((code << 8) | nextRc()) & 0xFFFFFFFFL; k += 1 }
      val probs = Array.fill(NumProbs)(KInitProb)
      def decodeBit(i: Int): Int = {
        val bound = (range >>> KBits) * probs(i)
        var bit = 0
        if (code < bound) {
          range = bound; probs(i) += (2048 - probs(i)) >> 5
        } else {
          range -= bound; code -= bound; probs(i) -= probs(i) >> 5; bit = 1
        }
        if (range < KTop) {
          range = (range << 8) & 0xFFFFFFFFL
          code = ((code << 8) | nextRc()) & 0xFFFFFFFFL
        }
        bit
      }
      var mainPos = 0
      var callPos = 0
      var jumpPos = 0
      var pos = 0
      var prev = 0
      while (pos < outLen) {
        if (mainPos >= main.length) bail("bcj2_main_truncated")
        val b = main(mainPos) & 0xff
        mainPos += 1
        out(pos) = b.toByte
        pos += 1
        if (isCandidate(b, prev)) {
          if (decodeBit(probIndex(b, prev)) == 1) {
            if (pos + 4 > outLen) bail("bcj2_overrun")
            val dest =
              if (b == 0xE8) {
                if (callPos + 4 > call.length) bail("bcj2_call_truncated")
                val v = ((call(callPos) & 0xffL) << 24) |
                  ((call(callPos + 1) & 0xffL) << 16) |
                  ((call(callPos + 2) & 0xffL) << 8) |
                  (call(callPos + 3) & 0xffL)
                callPos += 4; v
              } else {
                if (jumpPos + 4 > jump.length) bail("bcj2_jump_truncated")
                val v = ((jump(jumpPos) & 0xffL) << 24) |
                  ((jump(jumpPos + 1) & 0xffL) << 16) |
                  ((jump(jumpPos + 2) & 0xffL) << 8) |
                  (jump(jumpPos + 3) & 0xffL)
                jumpPos += 4; v
              }
            val src = (dest - (pos + 4)) & 0xFFFFFFFFL
            out(pos) = (src & 0xff).toByte
            out(pos + 1) = ((src >>> 8) & 0xff).toByte
            out(pos + 2) = ((src >>> 16) & 0xff).toByte
            out(pos + 3) = ((src >>> 24) & 0xff).toByte
            pos += 4
            prev = ((dest >>> 24) & 0xff).toInt
          } else prev = b
        } else prev = b
      }
      // strict accounting: the writer sizes every stream exactly; a
      // surplus byte is a stream the walk cannot attribute
      if (mainPos != main.length || callPos != call.length ||
        jumpPos != jump.length) bail("bcj2_stream_surplus")
      Right(out)
    } catch { case e: Bail => Left(e.reason) }
}
