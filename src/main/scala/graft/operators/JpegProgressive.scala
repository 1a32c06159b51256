package graft.operators

import Jpeg._

/** Progressive JPEG (T.81 Annex G): spectral selection + successive
  * approximation over the same Huffman/IDCT core as [[Jpeg]]'s baseline
  * path. A meaningful share of real crawl images is progressive; before
  * this, they all quarantined at the SOF2 marker.
  *
  * The coefficient model is T.81's: every scan deposits bits into a
  * per-component DCT coefficient array — DC first scans send
  * `diff << Al` with per-scan predictors, DC refinements OR in one bit
  * per block, AC first scans send `extend(bits) << Al` runs per spectral
  * band with END-OF-BAND RUNS spanning blocks (EOBn, G.1.2.2), AC
  * refinements walk the band emitting newly-significant ±1·2^Al values
  * and one correction bit per already-significant coefficient
  * (G.1.2.3) — and the final dequantize + IDCT runs once per block after
  * all scans.
  *
  * Reject-don't-guess, like the baseline decoder: grammar violations,
  * truncated entropy data, and — specific to progressive — ILLEGAL SCAN
  * SCRIPTS all decode to None. The script rules enforced (T.81
  * G.1.1.1.1): Ss=0 iff Se=0; AC scans are single-component; a
  * component's AC scans require its DC first scan; a first scan (Ah=0)
  * must not repeat a band; a refinement must continue the band's exact
  * successive-approximation chain (Ah = previous Al, Al = Ah-1). The
  * per-(component, coefficient) progression ledger that checks this is
  * 64 ints per component.
  *
  * The encoder exists for fixtures and the equivalence gate: encoding
  * the same pixels as baseline and as progressive yields IDENTICAL
  * quantized coefficients (same fdct, same tables), so the two decodes
  * must agree BIT-FOR-BIT on every pixel — an exactness witness that
  * needs no reference decoder and survives arbitrary (non-flat) content.
  */
object JpegProgressive {

  /** One scan of a progressive script: component indices (into the SOF
    * component list), spectral band [ss, se], successive-approximation
    * high/low bit positions. */
  final case class Scan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)

  /** A scan script exercising both progressive dimensions: DC with one
    * approximation pass, AC split into two spectral bands at reduced
    * precision, then AC refinement per band. AC scans are per-component
    * (T.81 requires it). */
  def defaultScript(nComp: Int): Seq[Scan] = {
    val dc = Seq(Scan(0 until nComp, 0, 0, 0, 1), Scan(0 until nComp, 0, 0, 1, 0))
    val ac = (0 until nComp).flatMap { c =>
      Seq(Scan(Seq(c), 1, 5, 0, 1), Scan(Seq(c), 6, 63, 0, 1),
        Scan(Seq(c), 1, 5, 1, 0), Scan(Seq(c), 6, 63, 1, 0))
    }
    dc.take(1) ++ ac.take(2 * nComp) ++ dc.drop(1) ++ ac.drop(2 * nComp)
  }

  // ---- encoder ----

  /** Progressive AC Huffman alphabet: the baseline table's symbols PLUS
    * the EOBn family (RRRRSSSS with SSSS=0, RRRR=0..14 — end-of-band
    * runs of 2^RRRR..2^(RRRR+1)-1 blocks, T.81 G.1.2.2), which baseline
    * reserves. All 176 symbols at code length 8 — canonical and legal
    * (≤ 255 codes of one length). */
  private[operators] val acValsProg: Array[Int] =
    ((0 to 14).map(_ << 4) ++ Seq(0xf0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)).toArray
  private[operators] val acBitsProg: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, acValsProg.length, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Per-component coefficient grid: quantized zigzag-order blocks over
    * the MCU-padded plane, plus the TIGHT block dims non-interleaved
    * scans cover (ceil of the component's sampled size — padding blocks
    * exist only for interleaved MCU geometry, T.81 A.2.2/A.2.3). */
  private final case class CompCoef(
      hs: Int, vs: Int, tq: Int,
      padBX: Int, padBY: Int, tightBX: Int, tightBY: Int,
      blocks: Array[Array[Int]])

  private def quantizeComp(plane: Array[Byte], w: Int, h: Int,
      hs: Int, vs: Int, tq: Int, mcusX: Int, mcusY: Int,
      qtab: Array[Int]): CompCoef = {
    val padBX = mcusX * hs
    val padBY = mcusY * vs
    val blocks = new Array[Array[Int]](padBX * padBY)
    var by = 0
    while (by < padBY) {
      var bx = 0
      while (bx < padBX) {
        val coef = fdct(gatherBlock(plane, w, h, bx, by))
        blocks(by * padBX + bx) = Array.tabulate(64)(i =>
          math.round(coef(zigzag(i)) / qtab(zigzag(i))).toInt)
        bx += 1
      }
      by += 1
    }
    CompCoef(hs, vs, tq, padBX, padBY, (w + 7) / 8, (h + 7) / 8, blocks)
  }

  /** DC scan emitter over the given block sequence (already in scan
    * order). First pass Huffman-codes `(v >> al) - (prev >> al)` diffs;
    * refinement emits bit `(v >> al) & 1` per block. Returns nothing —
    * bits land in `bw`. */
  private def emitDc(bw: BitWriter, dcCodes: Map[Int, (Int, Int)],
      perBlock: Seq[(Int, Array[Int])], ah: Int, al: Int): Unit =
    if (ah == 0) {
      val prev = new Array[Int](16) // by component index; 0-init = T.81 start
      perBlock.foreach { case (ci, q) =>
        val v = q(0) >> al
        val diff = v - prev(ci)
        prev(ci) = v
        val size = category(diff)
        val (c, l) = dcCodes(size)
        bw.put(c, l)
        if (size > 0) bw.put(magnitudeBits(diff, size), size)
      }
    } else
      perBlock.foreach { case (_, q) => bw.put((q(0) >> al) & 1, 1) }

  /** AC first scan (G.1.2.2) with cross-block EOB runs. */
  private def emitAcFirst(bw: BitWriter, acCodes: Map[Int, (Int, Int)],
      blocks: Seq[Array[Int]], ss: Int, se: Int, al: Int): Unit = {
    var eobRun = 0
    def flushEob(): Unit = if (eobRun > 0) {
      val r = 31 - Integer.numberOfLeadingZeros(eobRun)
      val (c, l) = acCodes(r << 4)
      bw.put(c, l)
      if (r > 0) bw.put(eobRun - (1 << r), r)
      eobRun = 0
    }
    blocks.foreach { q =>
      def div(v: Int) = if (v >= 0) v >> al else -((-v) >> al)
      var lastNz = se
      while (lastNz >= ss && div(q(lastNz)) == 0) lastNz -= 1
      if (lastNz < ss) {
        eobRun += 1
        if (eobRun == 0x7fff) flushEob()
      } else {
        flushEob()
        var run = 0
        var k = ss
        while (k <= lastNz) {
          val v = div(q(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { val (c, l) = acCodes(0xf0); bw.put(c, l); run -= 16 }
            val size = category(v)
            val (c, l) = acCodes((run << 4) | size)
            bw.put(c, l)
            bw.put(magnitudeBits(v, size), size)
            run = 0
          }
          k += 1
        }
        if (lastNz < se) eobRun += 1
      }
    }
    flushEob()
  }

  /** AC refinement scan (G.1.2.3): newly-significant coefficients emit a
    * run-length symbol of ZERO-HISTORY positions skipped plus a sign
    * bit; every already-significant coefficient passed on the way emits
    * one correction bit, queued until the next symbol. Per-block EOB
    * (run length 1) keeps the emitter simple — cross-block EOB runs are
    * exercised on the FIRST-scan path above, and the decoder handles
    * both everywhere. */
  private def emitAcRefine(bw: BitWriter, acCodes: Map[Int, (Int, Int)],
      blocks: Seq[Array[Int]], ss: Int, se: Int, al: Int): Unit = {
    blocks.foreach { q =>
      def now(k: Int) = math.abs(q(k)) >> al // current-precision magnitude
      def hist(k: Int) = math.abs(q(k)) >> (al + 1) // already-significant?
      // the last NEWLY-significant position: ZRLs may only be emitted
      // while another new coefficient follows — trailing zero runs fold
      // into EOB (T.81 G.1.2.3's "EOB decision"; a ZRL there would make
      // the decoder walk a span no symbol terminates)
      var lastNew = ss - 1
      var j = ss
      while (j <= se) { if (hist(j) == 0 && now(j) == 1) lastNew = j; j += 1 }
      var run = 0
      val pending = new scala.collection.mutable.ArrayBuffer[Int]()
      var k = ss
      while (k <= se) {
        val n = now(k)
        if (n == 0) run += 1
        else {
          // the ZRL check runs at EVERY nonzero position (not just the
          // newly-significant ones): a correction bit buffered after the
          // ZRL's 16-zero span would otherwise be flushed with the WRONG
          // symbol and desync the decoder's interleaved position walk
          while (run > 15 && k <= lastNew) {
            val (c, l) = acCodes(0xf0); bw.put(c, l)
            pending.foreach(bw.put(_, 1)); pending.clear()
            run -= 16
          }
          if (hist(k) != 0) pending += (n & 1) // correction bit, queued
          else { // newly significant (exactly ±1 at this precision)
            val (c, l) = acCodes((run << 4) | 1)
            bw.put(c, l)
            bw.put(if (q(k) >= 0) 1 else 0, 1)
            pending.foreach(bw.put(_, 1)); pending.clear()
            run = 0
          }
        }
        k += 1
      }
      if (run > 0 || pending.nonEmpty) {
        val (c, l) = acCodes(0x00) // EOB, run length 1
        bw.put(c, l)
        pending.foreach(bw.put(_, 1))
      }
    }
  }

  /** Emit one scan. `restartInterval` > 0 splits the scan's unit
    * sequence (MCUs when interleaved, blocks otherwise) into byte-
    * aligned restart segments separated by cycling RSTn markers, with DC
    * predictors and EOB runs reset per segment (T.81 E.2.4 applies to
    * every scan of a progressive frame). Interleaved segments group
    * whole MCUs, so the grouping key is the MCU index, not the block. */
  private def emitScan(out: java.io.ByteArrayOutputStream,
      comps: Array[CompCoef], scan: Scan, mcusX: Int, mcusY: Int,
      dcCodes: Map[Int, (Int, Int)], acCodes: Map[Int, (Int, Int)],
      restartInterval: Int): Unit = {
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    val compBytes = scan.comps.flatMap(c => Seq(c + 1, 0x00)).toArray
    seg(0xda, (scan.comps.length +: compBytes) ++
      Array(scan.ss, scan.se, (scan.ah << 4) | scan.al))
    // units in scan order: (unit index, blocks of that unit)
    val units: Seq[Seq[(Int, Array[Int])]] =
      if (scan.comps.length > 1) {
        for (my <- 0 until mcusY; mx <- 0 until mcusX) yield {
          for {
            ci <- scan.comps
            c = comps(ci)
            vb <- 0 until c.vs; hb <- 0 until c.hs
          } yield (ci, c.blocks((my * c.vs + vb) * c.padBX + mx * c.hs + hb))
        }
      } else {
        val ci = scan.comps.head
        val c = comps(ci)
        for (by <- 0 until c.tightBY; bx <- 0 until c.tightBX)
          yield Seq((ci, c.blocks(by * c.padBX + bx)))
      }
    val segments =
      if (restartInterval > 0) units.grouped(restartInterval).toSeq
      else Seq(units)
    segments.zipWithIndex.foreach { case (segUnits, si) =>
      if (si > 0) marker(0xd0 + ((si - 1) % 8))
      val bw = new BitWriter
      val flat = segUnits.flatten
      if (scan.ss == 0) emitDc(bw, dcCodes, flat, scan.ah, scan.al)
      else {
        val blocks = flat.map(_._2)
        if (scan.ah == 0)
          emitAcFirst(bw, acCodes, blocks, scan.ss, scan.se, scan.al)
        else emitAcRefine(bw, acCodes, blocks, scan.ss, scan.se, scan.al)
      }
      val entropy = bw.finish()
      out.write(entropy, 0, entropy.length)
    }
  }

  private def writeHeaders(out: java.io.ByteArrayOutputStream,
      w: Int, h: Int, compSpecs: Seq[(Int, Int, Int)]): Unit = {
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, 0x00 +: Array.tabulate(64)(i => quant(zigzag(i))))
    if (compSpecs.length > 1)
      seg(0xdb, 0x01 +: Array.tabulate(64)(i => quantC(zigzag(i))))
    // SOF2: progressive DCT, Huffman
    val sof = Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, compSpecs.length) ++
      compSpecs.zipWithIndex.flatMap { case ((hs, vs, tq), i) =>
        Seq(i + 1, (hs << 4) | vs, tq)
      }
    seg(0xc2, sof)
    seg(0xc4, (0x00 +: (dcBits ++ dcVals)) ++ (0x10 +: (acBitsProg ++ acValsProg)))
  }

  /** Encode a grayscale plane progressively. */
  def encodeGray(w: Int, h: Int, px: Array[Byte],
      script: Seq[Scan] = null, restartInterval: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1 && px.length == w * h)
    require(restartInterval >= 0 && restartInterval <= 0xffff)
    val scans = Option(script).getOrElse(defaultScript(1))
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((1, 1, 0)))
    if (restartInterval > 0) {
      out.write(0xff); out.write(0xdd); out.write(0); out.write(4)
      out.write(restartInterval >> 8); out.write(restartInterval & 0xff)
    }
    val comp = quantizeComp(px, w, h, 1, 1, 0, (w + 7) / 8, (h + 7) / 8, quant)
    val dcCodes = canonicalCodes(dcBits, dcVals)
    val acCodes = canonicalCodes(acBitsProg, acValsProg)
    scans.foreach(s => emitScan(out, Array(comp), s, (w + 7) / 8, (h + 7) / 8,
      dcCodes, acCodes, restartInterval))
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Encode full-res Y + subsampled chroma as progressive 4:2:0 (same
    * plane preparation as [[Jpeg.encodeColor420]], same quant tables —
    * so the quantized coefficients match the baseline encoder's and the
    * decode-equivalence gate applies). */
  def encodeColor420(w: Int, h: Int, yP: Array[Byte], cbP: Array[Byte],
      crP: Array[Byte], script: Seq[Scan] = null): Array[Byte] = {
    require(w >= 1 && h >= 1 && yP.length == w * h &&
      cbP.length == w * h && crP.length == w * h)
    val scans = Option(script).getOrElse(defaultScript(3))
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, Seq((2, 2, 0), (1, 1, 1), (1, 1, 1)))
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    val (cw, ch, cb) = subsample(cbP, w, h)
    val (_, _, cr) = subsample(crP, w, h)
    val comps = Array(
      quantizeComp(yP, w, h, 2, 2, 0, mcusX, mcusY, quant),
      quantizeComp(cb, cw, ch, 1, 1, 1, mcusX, mcusY, quantC),
      quantizeComp(cr, cw, ch, 1, 1, 1, mcusX, mcusY, quantC))
    val dcCodes = canonicalCodes(dcBits, dcVals)
    val acCodes = canonicalCodes(acBitsProg, acValsProg)
    scans.foreach(s => emitScan(out, comps, s, mcusX, mcusY, dcCodes, acCodes, 0))
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  // ---- decoder ----

  /** Per-component decode state. `coef` holds zigzag-order coefficients
    * per padded block; `prog` is the progression ledger: prog(k) = the
    * NEXT expected Al for coefficient k (Int.MaxValue = never sent). */
  private final class DComp(val id: Int, val hs: Int, val vs: Int, val tq: Int) {
    var td = 0
    var ta = 0
    var padBX = 0; var padBY = 0
    var tightBX = 0; var tightBY = 0
    var coef: Array[Int] = null // (padBX*padBY) * 64, zigzag order
    val prog: Array[Int] = Array.fill(64)(Int.MaxValue)
  }

  /** Decode a progressive (SOF2) stream to MCU-padded spatial planes —
    * the same output contract as the baseline core, so [[Jpeg]]'s
    * gray/RGB tails apply unchanged. None on any violation. */
  private[operators] def decodePlanes(p: Array[Byte]): Option[(Int, Int, Array[Comp])] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    var i = 2
    var w = 0; var h = 0
    val qts = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[DComp] = null
    var restartInterval = 0
    var mcusX = 0; var mcusY = 0
    var sawEoi = false
    var anyScan = false

    def decodeScan(scanComps: Array[DComp], ss: Int, se: Int,
        ah: Int, al: Int, from: Int): Option[Int] = {
      val br = new BitReader(p, from)
      val prevDc = new Array[Int](scanComps.length)
      var eobRun = 0
      var expectRst = 0
      var unit = 0 // MCUs (interleaved) or blocks (single-component)

      def maybeRestart(): Boolean = {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart() match {
            case Some(m) if m == expectRst =>
              expectRst = (expectRst + 1) % 8
              java.util.Arrays.fill(prevDc, 0)
              eobRun = 0
            case _ => return false
          }
        }
        true
      }

      def dcFirst(c: DComp, ci: Int, block: Int): Boolean = {
        val size = dcTabs(c.td).decode(br).getOrElse(return false)
        if (size > 11) return false
        val diff = extend(br.bits(size), size)
        if (br.truncated) return false
        prevDc(ci) += diff
        c.coef(block * 64) = prevDc(ci) << al
        true
      }
      def dcRefine(c: DComp, block: Int): Boolean = {
        val b = br.bit()
        if (br.truncated) return false
        if (b == 1) c.coef(block * 64) |= (1 << al)
        true
      }
      def acFirst(c: DComp, block: Int): Boolean = {
        if (eobRun > 0) { eobRun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = acTabs(c.ta).decode(br).getOrElse(return false)
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              eobRun = (1 << r) - 1
              if (r > 0) { eobRun += br.bits(r); if (br.truncated) return false }
              return true // end of band for this block
            }
          } else {
            k += r
            if (k > se) return false
            val v = extend(br.bits(s), s)
            if (br.truncated) return false
            c.coef(block * 64 + k) = v << al
            k += 1
          }
        }
        true
      }
      def acRefine(c: DComp, block: Int): Boolean = {
        val base = block * 64
        val p1 = 1 << al
        def correct(k: Int): Boolean = {
          val b = br.bit()
          if (br.truncated) return false
          if (b == 1 && (math.abs(c.coef(base + k)) & p1) == 0)
            c.coef(base + k) += (if (c.coef(base + k) >= 0) p1 else -p1)
          true
        }
        var k = ss
        if (eobRun == 0) {
          while (k <= se) {
            val rs = acTabs(c.ta).decode(br).getOrElse(return false)
            var r = rs >> 4
            val s = rs & 0x0f
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                eobRun = (1 << r) - 1
                if (r > 0) { eobRun += br.bits(r); if (br.truncated) return false }
                // fall through to the EOB sweep below
                r = -1
              }
              // r == 15: ZRL — skip 16 zero-history positions
            } else {
              if (s != 1) return false // refinement can only create ±1<<Al
              val sign = br.bit()
              if (br.truncated) return false
              newVal = if (sign == 1) p1 else -p1
            }
            if (r < 0) {
              // EOB signalled: remaining nonzero-history coefficients in
              // THIS block still get correction bits
              while (k <= se) {
                if (c.coef(base + k) != 0 && !correct(k)) return false
                k += 1
              }
            } else {
              // advance past r zero-history positions (correcting nonzero
              // ones on the way), then deposit the new value if any
              var placed = false
              while (k <= se && !placed) {
                if (c.coef(base + k) != 0) {
                  if (!correct(k)) return false
                } else {
                  if (r == 0) {
                    if (s != 0) { c.coef(base + k) = newVal; placed = true }
                    else placed = true // ZRL consumed its 16th zero
                  } else r -= 1
                }
                k += 1
              }
              if (s != 0 && !placed) return false // run overflowed the band
            }
          }
        } else {
          // inside an EOB run: only correction bits for this block's band
          while (k <= se) {
            if (c.coef(base + k) != 0 && !correct(k)) return false
            k += 1
          }
          eobRun -= 1
        }
        true
      }

      if (scanComps.length > 1) {
        // interleaved: DC scans only (T.81 G.1.1.1)
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (!maybeRestart()) return None
            var ci = 0
            while (ci < scanComps.length) {
              val c = scanComps(ci)
              var vb = 0
              while (vb < c.vs) {
                var hb = 0
                while (hb < c.hs) {
                  val block = (my * c.vs + vb) * c.padBX + mx * c.hs + hb
                  val ok = if (ah == 0) dcFirst(c, ci, block) else dcRefine(c, block)
                  if (!ok) return None
                  hb += 1
                }
                vb += 1
              }
              ci += 1
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else {
        val c = scanComps(0)
        var by = 0
        while (by < c.tightBY) {
          var bx = 0
          while (bx < c.tightBX) {
            if (!maybeRestart()) return None
            val block = by * c.padBX + bx
            val ok =
              if (ss == 0) { if (ah == 0) dcFirst(c, 0, block) else dcRefine(c, block) }
              else { if (ah == 0) acFirst(c, block) else acRefine(c, block) }
            if (!ok) return None
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
      // entropy data ends at the next marker: byte-align and locate it
      var j = br.i
      if (j > p.length) return None
      Some(j)
    }

    while (!sawEoi) {
      // scan forward to the next marker (skipping entropy bytes is the
      // caller's job — between segments we must be AT a marker)
      if (i + 1 >= p.length) return None
      if ((p(i) & 0xff) != 0xff) return None
      var mi = i
      while (mi + 1 < p.length && (p(mi + 1) & 0xff) == 0xff) mi += 1
      val m = p(mi + 1) & 0xff
      i = mi
      if (m == 0xd9) { sawEoi = true; i += 2 }
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
      else {
        if (i + 4 > p.length) return None
        val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > p.length) return None
        val body = i + 4
        val bodyLen = len - 2
        m match {
          case 0xdb =>
            var j = body
            while (j < body + bodyLen) {
              val pqTq = p(j) & 0xff
              if ((pqTq >> 4) != 0) return None
              if (j + 65 > body + bodyLen) return None
              val tq = pqTq & 0x0f
              if (tq > 3) return None
              val qt = new Array[Int](64)
              var k = 0
              while (k < 64) { qt(zigzag(k)) = p(j + 1 + k) & 0xff; k += 1 }
              qts(tq) = qt
              j += 65
            }
          case 0xc4 =>
            var j = body
            while (j < body + bodyLen) {
              val tcTh = p(j) & 0xff
              if (j + 17 > body + bodyLen) return None
              val bits = Array.tabulate(16)(k => p(j + 1 + k) & 0xff)
              val n = bits.sum
              if (j + 17 + n > body + bodyLen) return None
              val vals = Array.tabulate(n)(k => p(j + 17 + k) & 0xff)
              val th = tcTh & 0x0f
              if (th > 3) return None
              (tcTh >> 4) match {
                case 0 => dcTabs(th) = new HuffTable(bits, vals)
                case 1 => acTabs(th) = new HuffTable(bits, vals)
                case _ => return None
              }
              j += 17 + n
            }
          case 0xc2 =>
            if (comps != null) return None // one frame header only
            if (bodyLen < 8 || (p(body) & 0xff) != 8) return None
            h = ((p(body + 1) & 0xff) << 8) | (p(body + 2) & 0xff)
            w = ((p(body + 3) & 0xff) << 8) | (p(body + 4) & 0xff)
            val nComp = p(body + 5) & 0xff
            if (nComp != 1 && nComp != 3) return None
            if (bodyLen < 6 + 3 * nComp) return None
            // coefficient planes are 4-byte ints: a tighter cap than the
            // baseline byte planes keeps worst-case memory equivalent
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
            comps = Array.tabulate(nComp) { c =>
              val o = body + 6 + 3 * c
              val samp = p(o + 1) & 0xff
              new DComp(p(o) & 0xff, samp >> 4, samp & 0x0f, p(o + 2) & 0xff)
            }
            val sampOk =
              if (nComp == 1) comps(0).hs == 1 && comps(0).vs == 1
              else {
                val y = comps(0); val u = comps(1); val v = comps(2)
                val c11 = u.hs == 1 && u.vs == 1 && v.hs == 1 && v.vs == 1
                ((y.hs == 1 && y.vs == 1) || (y.hs == 2 && y.vs == 2)) && c11
              }
            if (!sampOk || comps.exists(_.tq > 3)) return None
            val hMax = comps.map(_.hs).max
            val vMax = comps.map(_.vs).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            comps.foreach { c =>
              c.padBX = mcusX * c.hs
              c.padBY = mcusY * c.vs
              c.tightBX = (w * c.hs + 8 * hMax - 1) / (8 * hMax)
              c.tightBY = (h * c.vs + 8 * vMax - 1) / (8 * vMax)
              c.coef = new Array[Int](c.padBX * c.padBY * 64)
            }
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // this decoder is the SOF2 path
          case 0xdd =>
            if (bodyLen != 2) return None
            restartInterval = ((p(body) & 0xff) << 8) | (p(body + 1) & 0xff)
          case 0xda =>
            if (comps == null) return None
            val ns = p(body) & 0xff
            if (ns < 1 || ns > comps.length || bodyLen != 4 + 2 * ns) return None
            val scanComps = new Array[DComp](ns)
            var c = 0
            while (c < ns) {
              val cid = p(body + 1 + 2 * c) & 0xff
              val tdTa = p(body + 2 + 2 * c) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.td = tdTa >> 4
              comp.ta = tdTa & 0x0f
              if (comp.td > 3 || comp.ta > 3) return None
              scanComps(c) = comp
              c += 1
            }
            val ss = p(body + 1 + 2 * ns) & 0xff
            val se = p(body + 2 + 2 * ns) & 0xff
            val ahAl = p(body + 3 + 2 * ns) & 0xff
            val ah = ahAl >> 4
            val al = ahAl & 0x0f
            // script legality (G.1.1.1.1)
            if (se > 63 || ss > se || al > 13 || ah > 13) return None
            if ((ss == 0) != (se == 0)) return None
            if (ss > 0 && ns != 1) return None // AC scans are single-component
            if (ah != 0 && ah != al + 1) return None // SA chain steps by one bit
            scanComps.foreach { comp =>
              if (ss > 0 && comp.prog(0) == Int.MaxValue)
                return None // AC before the component's DC first scan
              var k = math.max(ss, if (ss == 0) 0 else ss)
              while (k <= se) {
                if (ah == 0) {
                  if (comp.prog(k) != Int.MaxValue) return None // band resent
                } else if (comp.prog(k) != ah) return None // broken SA chain
                k += 1
              }
            }
            // table availability: DC scans need DC tables (first pass
            // only — refinements are raw bits); AC scans need AC tables
            if (ss == 0 && ah == 0 && scanComps.exists(c2 => dcTabs(c2.td) == null))
              return None
            if (ss > 0 && scanComps.exists(c2 => acTabs(c2.ta) == null))
              return None
            val next = decodeScan(scanComps, ss, se, ah, al, body + bodyLen)
              .getOrElse(return None)
            scanComps.foreach { comp =>
              var k = ss
              while (k <= se) { comp.prog(k) = al; k += 1 }
            }
            anyScan = true
            i = next
            // skip the length-based advance below
            // (entropy data followed the SOS header)
            // fallthrough control: continue outer loop
            // note: `i` already points at the next marker boundary
            // (decodeScan byte-aligned)
            // we must NOT run `i += 2 + len`
            // so loop continues here
            // (handled by the early `if (m == 0xda)` structure below)
            // -- placeholder comment, logic handled via `advance` flag
          case _ => ()
        }
        if (m != 0xda) i += 2 + len
      }
    }
    if (comps == null || !anyScan) return None
    // every component must have received at least its DC band in full
    // precision? T.81 allows delivering fewer bits (a truncated-but-
    // well-formed progressive file renders coarsely); we require the
    // script to have COMPLETED the SA chain for every band it opened —
    // partial chains mean the encoder intended more scans
    comps.foreach { c =>
      var k = 0
      while (k < 64) {
        if (c.prog(k) != Int.MaxValue && c.prog(k) != 0) return None
        k += 1
      }
      if (c.prog(0) == Int.MaxValue) return None // no DC at all
    }
    // dequantize + IDCT into spatial planes
    val out = comps.map { c =>
      val qt = qts(c.tq)
      if (qt == null) return None
      val comp = Comp(c.id, c.hs, c.vs, c.tq)
      comp.planeW = c.padBX * 8
      comp.planeH = c.padBY * 8
      comp.plane = new Array[Byte](comp.planeW * comp.planeH)
      var by = 0
      while (by < c.padBY) {
        var bx = 0
        while (bx < c.padBX) {
          val base = (by * c.padBX + bx) * 64
          val coef = new Array[Double](64)
          var z = 0
          while (z < 64) {
            coef(zigzag(z)) = c.coef(base + z).toDouble * qt(zigzag(z))
            z += 1
          }
          val sp = idct(coef)
          var r = 0
          while (r < 8) {
            var cc = 0
            while (cc < 8) {
              val v = math.round(sp(r * 8 + cc) + 128.0).toInt
              comp.plane((by * 8 + r) * comp.planeW + bx * 8 + cc) =
                math.max(0, math.min(255, v)).toByte
              cc += 1
            }
            r += 1
          }
          bx += 1
        }
        by += 1
      }
      comp
    }
    Some((w, h, out))
  }

  /** Gray progressive decode: (w, h, row-major pixels). */
  def decodeGray(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodePlanes(p).collect {
      case (w, h, comps) if comps.length == 1 =>
        val c = comps(0)
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          System.arraycopy(c.plane, y * c.planeW, out, y * w, w)
          y += 1
        }
        (w, h, out)
    }

  /** Color progressive decode to interleaved RGB — same upsample +
    * fixed-point conversion as the baseline path. */
  def decodeRgb(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodePlanes(p).collect {
      case (w, h, comps) if comps.length == 3 =>
        val yC = comps(0); val cbC = comps(1); val crC = comps(2)
        val hMax = comps.map(_.hs).max
        val vMax = comps.map(_.vs).max
        val out = new Array[Byte](3 * w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yv = yC.plane(y * yC.planeW + x) & 0xff
            val cy = y * cbC.vs / vMax
            val cx = x * cbC.hs / hMax
            val cbv = cbC.plane(cy * cbC.planeW + cx) & 0xff
            val crv = crC.plane(cy * crC.planeW + cx) & 0xff
            val (r, g, b) = ycbcrToRgb(yv, cbv, crv)
            val o = 3 * (y * w + x)
            out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
            x += 1
          }
          y += 1
        }
        (w, h, out)
    }

  /** Whether the stream's frame header is progressive (SOF2) — the
    * dispatch test [[Jpeg.decodeGray]]/[[Jpeg.decodeRgb]] use to route
    * here instead of rejecting. Walks segment lengths only. */
  def isProgressive(p: Array[Byte]): Boolean = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return false
    var i = 2
    while (i + 3 < p.length) {
      if ((p(i) & 0xff) != 0xff) return false
      val m = p(i + 1) & 0xff
      if (m == 0xc2) return true
      if (m == 0xda || m == 0xd9) return false // reached scan data
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else {
        val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        if (len < 2) return false
        i += 2 + len
      }
    }
    false
  }
}
