package graft.operators

/** Unix `compress` (.Z, LZW) — the last registered HTTP
  * `Content-Encoding` the engine didn't decode (`compress`), and the
  * `.tar.Z` seam beside `.tar.gz`/`.tar.bz2`/`.tar.xz`. The engine
  * already carries two LZW variants (GIF's LSB-first and TIFF's
  * MSB-first early-change); this is the third flavor: LSB-first,
  * 9→16-bit growing codes, block mode with a CLEAR code at 256, and
  * the famous `compress` GROUP-PADDING quirk — the encoder flushes
  * its output to an 8-code group boundary whenever the code width
  * changes (and after CLEAR), so a decoder that doesn't skip those
  * padding bits desyncs exactly at the first width bump.
  *
  * Wire grammar (public; the format of ncompress/compress(1), which
  * gzip also decodes): magic `1F 9D`, a flags byte (bits 0-4 max code
  * width 9..16, bit 7 block-mode), then LSB-first LZW codes. Codes
  * 0-255 are literals; 256 is CLEAR in block mode; table entries
  * assign upward from 257 (256 without block mode), each new entry =
  * previous string + first char of current (the KwKwK case handled).
  *
  * The on-system REFERENCE decoder is `gzip -d` (uncompress(1) here
  * is a gzip wrapper): the differential sweep
  * (tools/fuzz_compress_diff.py) feeds [[encode]] output to the real
  * gzip and requires byte-exact recovery, then requires [[decode]] to
  * agree on the same wire — encoder pinned against the reference,
  * decoder pinned against the encoder across the sweep's shapes.
  *
  * Reject-don't-guess: bad magic, reserved flag bits, a code beyond
  * the current table, a first code that isn't a literal, or output
  * past `maxOut` (`lzw_bomb`) quarantine by name.
  */
object UnixCompress {

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val Clear = 256

  def decode(blob: Array[Byte], maxOut: Int = 1 << 26)
      : Either[Rejected, Array[Byte]] =
    try {
      if (blob == null || blob.length < 3) bail("truncated_z")
      if ((blob(0) & 0xff) != 0x1F || (blob(1) & 0xff) != 0x9D)
        bail("not_compress")
      val flags = blob(2) & 0xff
      val maxBits = flags & 0x1F
      val block = (flags & 0x80) != 0
      if ((flags & 0x60) != 0) bail("reserved_flag_bits")
      if (maxBits < 9 || maxBits > 16) bail("bad_max_bits")

      val maxEntries = 1 << maxBits
      val prefix = new Array[Int](maxEntries)
      val suffix = new Array[Byte](maxEntries)
      val stack = new Array[Byte](maxEntries)
      val firstFree = if (block) Clear + 1 else Clear
      var free = firstFree
      var nBits = 9
      var maxCode = (1 << nBits) - 1

      val out = new java.io.ByteArrayOutputStream()
      // bit cursor over the code stream (bits after the 3 header bytes)
      val totalBits = (blob.length - 3).toLong * 8
      var pos = 0L

      def readCode(): Int = {
        if (pos + nBits > totalBits) return -1 // clean EOF mid-code
        var v = 0
        var k = 0
        while (k < nBits) {
          val bit = pos + k
          val byte = blob(3 + (bit >> 3).toInt) & 0xff
          v |= ((byte >> (bit & 7).toInt) & 1) << k
          k += 1
        }
        pos += nBits
        v
      }

      /** compress pads to an 8-code group of the CURRENT width on
        * width changes and CLEAR — and the group alignment is
        * RELATIVE TO THE LAST CHANGE POINT (the reference
        * implementation restarts its 8-code output buffer there), not
        * to the global bit position: a globally-aligned reader decodes
        * the first bump fine and desyncs at the second. */
      var groupBase = 0L
      def padToGroup(): Unit = {
        val group = nBits.toLong << 3 // 8 codes * nBits bits
        val rem = (pos - groupBase) % group
        if (rem != 0) pos += group - rem
        groupBase = pos
      }

      var oldCode = -1
      var finChar = 0
      var done = false
      while (!done) {
        // the reference's exact maxcode rule: at the width BUMPED INTO
        // maxbits the threshold becomes 1<<maxbits (so a full table
        // never re-triggers), but the INITIAL width uses (1<<n)-1 even
        // when it equals maxbits — so compress -b9 genuinely bumps to
        // 10-bit codes once its 512-entry table fills. Mirror it or
        // desync at exactly that point.
        if (free > maxCode) {
          padToGroup()
          nBits += 1
          maxCode = if (nBits >= maxBits) maxEntries else (1 << nBits) - 1
        }
        val code = readCode()
        if (code < 0) done = true
        else if (block && code == Clear) {
          padToGroup()
          nBits = 9
          maxCode = (1 << nBits) - 1
          free = firstFree
          oldCode = -1
        } else {
          if (oldCode < 0) {
            // first code (stream start or post-clear) must be a literal
            if (code > 255) bail("bad_first_code")
            finChar = code
            out.write(code)
            oldCode = code
          } else {
            if (code > free || (code == free && oldCode < 0))
              bail("code_out_of_range")
            var sp = 0
            var cur = code
            if (code == free) { // KwKwK: not yet in the table
              stack(sp) = finChar.toByte; sp += 1
              cur = oldCode
            }
            while (cur > 255) {
              if (sp >= stack.length) bail("corrupt_lzw_chain")
              stack(sp) = suffix(cur); sp += 1
              cur = prefix(cur)
            }
            finChar = cur
            stack(sp) = cur.toByte; sp += 1
            if (out.size() + sp > maxOut) bail("lzw_bomb")
            while (sp > 0) { sp -= 1; out.write(stack(sp)) }
            if (free < maxEntries) {
              prefix(free) = oldCode
              suffix(free) = finChar.toByte
              free += 1
            }
            oldCode = code
          }
        }
      }
      Right(out.toByteArray)
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  // ==================================================================
  // Encoder (fixture side; pinned against the system gzip -d)
  // ==================================================================

  /** Greedy LZW encode in the compress wire format. CLEAR is emitted
    * when the table fills (simpler than compress's ratio heuristic;
    * any conformant decoder — gzip included — accepts both). */
  def encode(data: Array[Byte], maxBits: Int = 16): Array[Byte] = {
    require(maxBits >= 9 && maxBits <= 16, "maxBits 9..16")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1F); out.write(0x9D)
    out.write(0x80 | maxBits) // block mode

    val maxEntries = 1 << maxBits
    var nBits = 9
    var maxCode = (1 << nBits) - 1
    var free = Clear + 1
    // (prevCode, byte) -> code
    var table = new java.util.HashMap[Integer, Integer]()

    var bitBuf = 0L
    var bitCnt = 0
    var codesOut = 0L // bits emitted, for group padding
    def putCode(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt
      bitCnt += nBits
      codesOut += nBits
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // group alignment is relative to the last change point (see the
    // decoder-side comment); both sides must restart the count there
    var groupBase = 0L
    def padToGroup(): Unit = {
      val group = nBits.toLong << 3
      val rem = (codesOut - groupBase) % group
      if (rem != 0) {
        var padBits = group - rem
        codesOut += padBits
        // flush the partial byte first, then whole zero bytes
        if (bitCnt > 0) {
          out.write((bitBuf & 0xff).toInt)
          padBits -= 8 - bitCnt
          bitBuf = 0; bitCnt = 0
        }
        while (padBits > 0) { out.write(0); padBits -= 8 }
      }
      groupBase = codesOut
    }
    // same maxcode rule as the decoder (see its comment): the bump
    // INTO maxbits raises the threshold to 1<<maxbits; the one-past
    // bump only ever fires when the initial width IS maxbits
    def maybeGrow(): Unit =
      if (free > maxCode) {
        padToGroup()
        nBits += 1
        maxCode = if (nBits >= maxBits) maxEntries else (1 << nBits) - 1
      }

    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xff
        val key: Integer = (cur << 8) | b
        val hit = table.get(key)
        if (hit != null) cur = hit
        else {
          putCode(cur)
          maybeGrow()
          if (free < maxEntries) {
            table.put(key, free)
            free += 1
          } else {
            // table full: clear and restart (block mode)
            putCode(Clear)
            padToGroup()
            nBits = 9
            maxCode = (1 << nBits) - 1
            free = Clear + 1
            table = new java.util.HashMap[Integer, Integer]()
          }
          cur = b
        }
        i += 1
      }
      putCode(cur)
    }
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }
}
