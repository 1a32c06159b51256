package graft.operators

/** BCJ x86 branch-converter decode — the `.xz` filter id 0x04 that
  * real `xz -F x86`-built archives (and most distro `.tar.xz`
  * payloads of compiled code) carry in front of LZMA2. The encoder
  * rewrites the rel32 operand of CALL/JMP (0xE8/0xE9) instructions to
  * absolute addresses so identical call targets compress; the decoder
  * here reverses it. Implemented from the public algorithm (the LZMA
  * SDK / xz `x86` branch filter is public domain and the algorithm is
  * documented in the xz file-format ecosystem); validated
  * differentially against xz-java's X86Options via XzSpec and
  * tools/XzDiff.
  *
  * The transform is size-preserving and runs in place over one
  * block's uncompressed bytes (filter state is per-block in .xz).
  * `startOffset` is the optional 4-byte filter property (defaults 0).
  *
  * The mask machinery below tracks which of the previous bytes were
  * 0x00/0xFF at positions that would have been converted — the
  * encoder refuses some overlapping patterns, and the decoder must
  * replay the same accept/reject decisions byte for byte or it
  * desyncs from the encoder's choices.
  */
object Bcj {

  private val MaskToAllowed =
    Array(true, true, true, false, true, false, false, false)
  private val MaskToBit = Array(0, 1, 2, 2, 3, 3, 3, 3)

  @inline private def msb(b: Int): Boolean = b == 0x00 || b == 0xFF

  /** In-place x86 BCJ decode of one block's bytes. */
  def x86Decode(buf: Array[Byte], startOffset: Long): Unit = {
    if (buf.length < 5) return
    val nowPos = startOffset.toInt // filter positions are mod 2^32
    var prevMask = 0
    var prevPos = nowPos - 5 // "far away" start: first match gets mask 0
    val limit = buf.length - 5
    var pos = 0
    while (pos <= limit) {
      val op = buf(pos) & 0xff
      if (op != 0xE8 && op != 0xE9) pos += 1
      else {
        val offset = (nowPos + pos) - prevPos
        prevPos = nowPos + pos
        if (offset > 5) prevMask = 0
        else {
          var i = 0
          while (i < offset) { prevMask &= 0x77; prevMask <<= 1; i += 1 }
        }
        var b = buf(pos + 4) & 0xff
        if (msb(b) && MaskToAllowed((prevMask >>> 1) & 7) &&
          (prevMask >>> 1) < 0x10) {
          var src = (b << 24) | ((buf(pos + 3) & 0xff) << 16) |
            ((buf(pos + 2) & 0xff) << 8) | (buf(pos + 1) & 0xff)
          var dest = 0
          var loop = true
          while (loop) {
            dest = src - (nowPos + pos + 5) // decode direction
            if (prevMask == 0) loop = false
            else {
              val i = MaskToBit(prevMask >>> 1)
              b = (dest >>> (24 - i * 8)) & 0xff
              if (!msb(b)) loop = false
              else src = dest ^ (if (i == 0) -1 else (1 << (32 - i * 8)) - 1)
            }
          }
          // top byte becomes a sign extension of bit 24
          buf(pos + 4) = (0 - ((dest >>> 24) & 1)).toByte
          buf(pos + 3) = (dest >>> 16).toByte
          buf(pos + 2) = (dest >>> 8).toByte
          buf(pos + 1) = dest.toByte
          pos += 5
          prevMask = 0
        } else {
          prevMask |= 1
          if (msb(b)) prevMask |= 0x10
          pos += 1
        }
      }
    }
  }
}
