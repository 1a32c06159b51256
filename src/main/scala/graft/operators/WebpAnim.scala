package graft.operators

/** Animated WebP (VP8X + ANIM/ANMF, container spec) — the sticker/
  * short-loop format a crawl meets beside GIF. Walks the animation:
  * canvas dims from VP8X, ANIM background color + loop count, and per
  * ANMF frame the placement (x/2, y/2 fields), dimensions, duration,
  * blend/dispose flags, and the frame PAYLOAD decoded with the
  * reference-sealed still decoders — VP8L frames to exact ARGB, lossy
  * VP8 frames to exact YUV (+ALPH alpha).
  *
  * Cross-frame canvas COMPOSITION (round 12, unblocked by [[WebpRgb]]
  * pinning YUV→RGB bit-exactly to libwebp): [[compose]] replays the
  * container spec's blend/dispose state machine — canvas starts fully
  * transparent, each frame either alpha-blends ("over", the libwebp
  * demuxer's non-premultiplied integer arithmetic) or replaces its
  * rect, and a dispose-to-background frame clears its rect after
  * display. Lossy frames enter the canvas through the WebPDecodeRGBA-
  * pinned color space, so scene-level dedup sees lossless and lossy
  * frames in ONE space. The q245 oracle replays composed canvases over
  * binary-alpha fixtures (where the blend arithmetic is exact by
  * construction); fractional-alpha blend math is pinned in
  * WebpAnimSpec.
  *
  * Reject-don't-guess: bad container, missing/short ANIM or ANMF
  * headers, frames whose rect leaves the canvas, truncated frame
  * payloads, and frames with no image chunk all quarantine by name.
  */
object WebpAnim {

  final case class Rejected(reason: String)

  /** One decoded animation frame. Exactly one of `argb` (lossless) or
    * `yuv` (lossy) is set. */
  final case class Frame(
      index: Int, x: Int, y: Int, w: Int, h: Int,
      durationMs: Int, noBlend: Boolean, disposeToBackground: Boolean,
      argb: Option[Array[Int]], yuv: Option[Vp8.Yuv])

  final case class Anim(
      canvasW: Int, canvasH: Int,
      backgroundArgb: Int, loopCount: Int,
      frames: Seq[Frame])

  private def u24(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
  private def u32(b: Array[Byte], o: Int): Int =
    u24(b, o) | ((b(o + 3) & 0xff) << 24)

  def decode(b: Array[Byte]): Either[Rejected, Anim] = {
    def fourcc(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 30 || fourcc(0) != "RIFF" || fourcc(8) != "WEBP" ||
        fourcc(12) != "VP8X")
      return Left(Rejected("not_animated_webp"))
    val xn = u32(b, 16)
    if (xn < 10 || 20 + xn > b.length) return Left(Rejected("truncated_chunk"))
    val flags = u32(b, 20)
    if ((flags & 0x02) == 0) return Left(Rejected("not_animated_webp"))
    val canvasW = 1 + u24(b, 24)
    val canvasH = 1 + u24(b, 27)
    if (canvasW.toLong * canvasH > (1L << 24)) return Left(Rejected("oversized"))
    var o = 20 + xn + (xn & 1)
    var bg = 0
    var loop = 0
    var sawAnim = false
    val frames = Seq.newBuilder[Frame]
    var index = 0
    while (o + 8 <= b.length) {
      val cc = fourcc(o)
      val size = u32(b, o + 4)
      if (size < 0 || o + 8 + size > b.length)
        return Left(Rejected("truncated_chunk"))
      cc match {
        case "ANIM" =>
          if (size < 6) return Left(Rejected("bad_anim_header"))
          bg = u32(b, o + 8)
          loop = (b(o + 12) & 0xff) | ((b(o + 13) & 0xff) << 8)
          sawAnim = true
        case "ANMF" =>
          if (!sawAnim) return Left(Rejected("anmf_before_anim"))
          if (size < 16) return Left(Rejected("bad_anmf_header"))
          val p = o + 8
          val fx = 2 * u24(b, p)
          val fy = 2 * u24(b, p + 3)
          val fw = 1 + u24(b, p + 6)
          val fh = 1 + u24(b, p + 9)
          val dur = u24(b, p + 12)
          val fflags = b(p + 15) & 0xff
          if (fx + fw > canvasW || fy + fh > canvasH)
            return Left(Rejected("frame_outside_canvas"))
          // frame data: optional ALPH then VP8/VP8L, inside the ANMF
          var fo = p + 16
          val fEnd = o + 8 + size
          var alph: Option[Array[Byte]] = None
          var decoded: Option[Frame] = None
          while (decoded.isEmpty && fo + 8 <= fEnd) {
            val fcc = fourcc(fo)
            val fsize = u32(b, fo + 4)
            if (fsize < 0 || fo + 8 + fsize > fEnd)
              return Left(Rejected("truncated_frame"))
            val body = java.util.Arrays.copyOfRange(b, fo + 8, fo + 8 + fsize)
            fcc match {
              case "ALPH" => alph = Some(body)
              case "VP8L" =>
                // frame payload is a full VP8L stream (with signature)
                Vp8l.decode(Vp8l.wrapRiff(body)) match {
                  case Left(r) => return Left(Rejected(s"frame_${r.reason}"))
                  case Right((w2, h2, px)) =>
                    if (w2 != fw || h2 != fh)
                      return Left(Rejected("frame_dims_mismatch"))
                    decoded = Some(Frame(index, fx, fy, fw, fh, dur,
                      (fflags & 2) != 0, (fflags & 1) != 0, Some(px), None))
                }
              case "VP8 " =>
                Vp8.decode(Vp8.wrapRiff(body)) match {
                  case Left(r) => return Left(Rejected(s"frame_${r.reason}"))
                  case Right(yuv0) =>
                    if (yuv0.w != fw || yuv0.h != fh)
                      return Left(Rejected("frame_dims_mismatch"))
                    val yuv = alph match {
                      case None => yuv0
                      case Some(chunk) =>
                        Vp8.decodeAlphaChunk(chunk, fw, fh) match {
                          case Left(r) => return Left(Rejected(s"frame_${r.reason}"))
                          case Right(a) => yuv0.copy(alpha = Some(a))
                        }
                    }
                    decoded = Some(Frame(index, fx, fy, fw, fh, dur,
                      (fflags & 2) != 0, (fflags & 1) != 0, None, Some(yuv)))
                }
              case _ => () // unknown sub-chunk: skip
            }
            fo += 8 + fsize + (fsize & 1)
          }
          decoded match {
            case None => return Left(Rejected("frame_without_image"))
            case Some(f) => frames += f; index += 1
          }
        case _ => () // EXIF/XMP/ICCP or stills mixed in: skip
      }
      o += 8 + size + (size & 1)
    }
    if (!sawAnim) return Left(Rejected("not_animated_webp"))
    if (index == 0) return Left(Rejected("no_frames"))
    Right(Anim(canvasW, canvasH, bg, loop, frames.result()))
  }

  // ---- canvas composition (container spec blend/dispose replay) ----

  /** One composed canvas: the full canvasW x canvasH ARGB state as
    * displayed at frame `index` (untouched pixels stay 0 = transparent). */
  final case class Composed(index: Int, durationMs: Int, argb: Array[Int])

  /** Non-premultiplied "over" in the libwebp demuxer's integer
    * arithmetic: src_a == 0 keeps dst; otherwise
    * a = sa + da(255-sa)/255, c = (sc*sa + dc*da(255-sa)/255) / a. */
  private[operators] def blendPixel(src: Int, dst: Int): Int = {
    val sa = (src >>> 24) & 0xff
    if (sa == 0) return dst
    if (sa == 255) return src
    val da = (dst >>> 24) & 0xff
    val scale = da * (255 - sa) / 255
    val a = sa + scale
    if (a == 0) return 0
    def ch(shift: Int): Int = {
      val sc = (src >> shift) & 0xff
      val dc = (dst >> shift) & 0xff
      math.min(255, (sc * sa + dc * scale) / a)
    }
    (a << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  /** Replay the animation's blend/dispose state machine into one full
    * ARGB canvas per frame. Lossy frames convert through [[WebpRgb]]
    * (the WebPDecodeRGBA-pinned space); lossless frames are already
    * exact ARGB. */
  def compose(anim: Anim): Seq[Composed] = {
    val cw = anim.canvasW
    val chh = anim.canvasH
    val canvas = new Array[Int](cw * chh)
    anim.frames.map { f =>
      val px: Array[Int] = f.argb.getOrElse(WebpRgb.toArgb(f.yuv.get))
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) {
          val at = (f.y + y) * cw + (f.x + x)
          val s = px(y * f.w + x)
          canvas(at) = if (f.noBlend) s else blendPixel(s, canvas(at))
          x += 1
        }
        y += 1
      }
      val shown = canvas.clone()
      if (f.disposeToBackground) {
        var yy = 0
        while (yy < f.h) {
          var xx = 0
          while (xx < f.w) {
            canvas((f.y + yy) * cw + (f.x + xx)) = 0
            xx += 1
          }
          yy += 1
        }
      }
      Composed(f.index, f.durationMs, shown)
    }
  }

  // ---- fixture assembly (the GIF pattern: own encoders per frame) ----

  /** Assemble an animation from per-frame stills (graft-encoded RIFF
    * blobs whose payload chunks are re-framed into ANMF). */
  def encode(canvasW: Int, canvasH: Int, backgroundArgb: Int, loopCount: Int,
      frames: Seq[(Int, Int, Int, Int, Array[Byte])] // (x, y, durMs, flags, still RIFF)
  ): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def chunk(cc: String, body: Array[Byte]): Unit = {
      out.write(cc.getBytes("US-ASCII")); le32(body.length)
      out.write(body, 0, body.length)
      if ((body.length & 1) == 1) out.write(0)
    }
    out.write("RIFF".getBytes("US-ASCII")); le32(0)
    out.write("WEBP".getBytes("US-ASCII"))
    val x = new Array[Byte](10)
    x(0) = 0x02 // animation flag
    def w24(arr: Array[Byte], o: Int, v: Int): Unit = {
      arr(o) = (v & 0xff).toByte; arr(o + 1) = ((v >> 8) & 0xff).toByte
      arr(o + 2) = ((v >> 16) & 0xff).toByte
    }
    w24(x, 4, canvasW - 1); w24(x, 7, canvasH - 1)
    chunk("VP8X", x)
    val anim = new Array[Byte](6)
    anim(0) = (backgroundArgb & 0xff).toByte
    anim(1) = ((backgroundArgb >> 8) & 0xff).toByte
    anim(2) = ((backgroundArgb >> 16) & 0xff).toByte
    anim(3) = ((backgroundArgb >> 24) & 0xff).toByte
    anim(4) = (loopCount & 0xff).toByte
    anim(5) = ((loopCount >> 8) & 0xff).toByte
    chunk("ANIM", anim)
    frames.foreach { case (fx, fy, dur, fflags, still) =>
      // lift the still's image (+ALPH) chunks out of its RIFF framing
      def stillChunks(b: Array[Byte]): Array[Byte] = {
        val body = new java.io.ByteArrayOutputStream()
        var o = 12
        while (o + 8 <= b.length) {
          val cc = new String(b, o, 4, "US-ASCII")
          val size = u32(b, o + 4)
          if (cc == "VP8 " || cc == "VP8L" || cc == "ALPH") {
            body.write(b, o, 8 + size)
            if ((size & 1) == 1) body.write(0)
          }
          o += 8 + size + (size & 1)
        }
        body.toByteArray
      }
      val dims = Multimodal.imageDims(still).getOrElse(
        throw new IllegalArgumentException("still must carry dims"))
      val hdr = new Array[Byte](16)
      w24(hdr, 0, fx / 2); w24(hdr, 3, fy / 2)
      w24(hdr, 6, dims._1 - 1); w24(hdr, 9, dims._2 - 1)
      w24(hdr, 12, dur)
      hdr(15) = fflags.toByte
      chunk("ANMF", hdr ++ stillChunks(still))
    }
    val bytes = out.toByteArray
    val size = bytes.length - 8
    bytes(4) = (size & 0xff).toByte; bytes(5) = ((size >> 8) & 0xff).toByte
    bytes(6) = ((size >> 16) & 0xff).toByte; bytes(7) = ((size >> 24) & 0xff).toByte
    bytes
  }
}
