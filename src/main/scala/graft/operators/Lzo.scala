package graft.operators

/** Raw LZO1X block decompression — the one ORC compression kind the
  * round-14 tail census still rejected by name. Grammar per the
  * public LZO1X format (documented in liblzo2/lzop and reimplemented
  * by every Hadoop-ecosystem codec): an instruction-byte state
  * machine of literal runs and back-references —
  *
  *   - M2 (t >= 64): len 3-8 from the instruction's top bits,
  *     distance 1..2048 from 3 instruction bits + one extra byte;
  *   - M3 (32 <= t < 64): len (t&31)+2 with zero-byte 255-extension,
  *     distance 1..16384 from a 2-byte LE field >> 2;
  *   - M4 (16 <= t < 32): the far match — distance 16385..49151 from
  *     ((t&8)<<11) + LE16>>2 + 16384, len (t&7)+2 extended; the
  *     all-zero distance IS the stream-end marker;
  *   - M1 (t < 16 after a match): len-2 near match;
  *   - after every match the low 2 bits of the second-to-last
  *     consumed byte give 0-3 literals copied immediately — the
  *     "state" that makes naive reimplementations corrupt output;
  *   - a literal run (t < 16 at top level) is followed by either a
  *     match or the special len-3 distance-2049+ form.
  *
  * Bounds-checked and bomb-capped with named fates; differential spec
  * pins byte-exact inversion of the REAL encoder on the classpath
  * (aircompressor's LzoCompressor — the codec orc-core itself embeds)
  * across content shapes, plus its decoder on our own constructions.
  */
object Lzo {

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  /** Decode one raw LZO1X block. `maxOut` caps the output allocation
    * (`lzo_bomb`). */
  def rawDecode(b: Array[Byte], off: Int, len: Int, maxOut: Int)
      : Either[String, Array[Byte]] =
    try Right(decode(b, off, len, maxOut))
    catch { case e: Bail => Left(e.reason) }

  private def decode(b: Array[Byte], off: Int, len: Int,
      maxOut: Int): Array[Byte] = {
    // the real encoder emits ZERO bytes for empty input (no end
    // marker) — an empty block is an empty payload, not corruption
    if (len == 0) return Array.emptyByteArray
    if (len < 0) bail("lzo_truncated")
    val end = off + len
    if (off < 0 || end > b.length) bail("lzo_truncated")
    var ip = off
    var out = new Array[Byte](math.min(math.max(64, 4 * len), maxOut))
    var op = 0

    def u8(): Int = {
      if (ip >= end) bail("lzo_truncated")
      val v = b(ip) & 0xff; ip += 1; v
    }
    def ensure(n: Int): Unit = {
      if (n > maxOut - op) bail("lzo_bomb")
      if (op + n > out.length) {
        val want = math.min(maxOut.toLong,
          math.max(out.length.toLong * 2, op.toLong + n)).toInt
        out = java.util.Arrays.copyOf(out, want)
      }
    }
    def copyLits(n: Int): Unit = {
      if (n > end - ip) bail("lzo_truncated")
      ensure(n)
      System.arraycopy(b, ip, out, op, n)
      ip += n; op += n
    }
    def copyMatch(dist: Int, n: Int): Unit = {
      if (dist < 1 || dist > op) bail("lzo_bad_distance")
      ensure(n)
      var s = op - dist
      var k = 0
      while (k < n) { out(op) = out(s); op += 1; s += 1; k += 1 }
    }
    /** zero-byte 255-extension: while 0 bytes, +255; then +base+byte. */
    def extend(base: Int): Int = {
      var t = 0
      var x = u8()
      while (x == 0) {
        t += 255
        if (t > maxOut) bail("lzo_bomb")
        x = u8()
      }
      t + base + x
    }

    var done = false
    // states for the hand-rolled goto graph
    var t = 0
    var section = 0 // 0 = top of loop, 1 = first_literal_run, 2 = match
    // first-byte special: >17 means an initial literal run
    if ((b(ip) & 0xff) > 17) {
      t = u8() - 17
      if (t < 4) {
        // short initial literals, then a match instruction follows
        copyLits(t)
        t = u8()
        section = 2
      } else {
        copyLits(t)
        section = 1
      }
    }

    while (!done) {
      section match {
        case 0 => // literal-run instruction
          t = u8()
          if (t >= 16) section = 2
          else {
            val n = if (t == 0) extend(15) else t
            copyLits(n + 3)
            section = 1
          }
        case 1 => // after a literal run: match, or the len-3 2049+ form
          t = u8()
          if (t >= 16) section = 2
          else {
            val dist = 2049 + (t >> 2) + (u8() << 2)
            copyMatch(dist, 3)
            // state bits: low 2 of the second-to-last consumed byte
            val st = b(ip - 2) & 3
            if (st == 0) section = 0
            else { copyLits(st); t = u8(); section = 2 }
          }
        case _ => // match instruction in t
          var isEof = false
          if (t >= 64) { // M2
            val d1 = u8()
            val dist = 1 + ((t >> 2) & 7) + (d1 << 3)
            copyMatch(dist, (t >> 5) + 1)
          } else if (t >= 32) { // M3
            val n = if ((t & 31) == 0) extend(31) else (t & 31)
            val lo = u8(); val hi = u8()
            val dist = 1 + (((lo | (hi << 8)) >> 2))
            copyMatch(dist, n + 2)
          } else if (t >= 16) { // M4 (far match / end marker)
            val n = if ((t & 7) == 0) extend(7) else (t & 7)
            val lo = u8(); val hi = u8()
            val d = ((t & 8) << 11) + ((lo | (hi << 8)) >> 2)
            if (d == 0) {
              // stream-end marker: nothing may follow it
              if (ip != end) bail("lzo_trailing_garbage")
              isEof = true
            } else copyMatch(d + 16384, n + 2)
          } else { // M1: len-2 near match
            val dist = 1 + (t >> 2) + (u8() << 2)
            copyMatch(dist, 2)
          }
          if (isEof) done = true
          else {
            val st = b(ip - 2) & 3
            if (st == 0) section = 0
            else { copyLits(st); t = u8(); section = 2 }
          }
      }
    }
    java.util.Arrays.copyOf(out, op)
  }
}
