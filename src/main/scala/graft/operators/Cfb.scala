package graft.operators

/** OLE2 / CFB (Compound File Binary) container walk — the pre-2007
  * binary Office family (`.doc`/`.xls`/`.ppt`, magic `D0 CF 11 E0`)
  * that crawled corpora are full of and that previously fell through
  * [[OfficeRouter]] as a generic `not_a_container`. The grammar is the
  * public [MS-CFB] spec: a 512-byte header (4096-byte sectors for
  * major version 4), a FAT located through the DIFAT (109 header
  * entries + a DIFAT sector chain), a directory of 128-byte entries
  * forming a sibling tree with child pointers, and a mini-FAT whose
  * 64-byte mini sectors live inside the root entry's own stream.
  *
  * Reject-don't-guess: every chain walk is cycle-guarded (a FAT that
  * points at itself is a classic hostile input) and every sector read
  * is bounds-checked, so a truncated or malicious file quarantines
  * with a named reason (`fat_cycle`, `directory_cycle`,
  * `sector_out_of_range`, `chain_too_short`, ...) instead of looping
  * or crashing the task. Total extracted bytes are capped (`cfb_bomb`)
  * — a 1 KB file can declare 4 GB streams.
  *
  * No external CFB reader or writer exists in this container (no POI,
  * no olefile), so — per the established construct-and-cross-check
  * playbook — [[Cfb.write]] emits spec-faithful fixtures (correct
  * DIFAT/FAT/miniFAT accounting, directory tree sorted by the CFB
  * name rule: length first, then upper-cased comparison) and the
  * parser is deliberately strict about everything the writer could
  * get wrong; hostile specs cover the mutations a lenient pair would
  * let slide.
  *
  * Reference behavior target: the engine's office ingest must at
  * minimum COUNT legacy Office correctly (census) and extract `.doc`
  * text (see [[Doc]]); `.xls`/`.ppt` payload decode stays out of
  * scope and rejects by name in the router.
  */
object Cfb {

  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)

  /** True iff the blob leads with the 8-byte CFB magic — the cheap
    * sniff [[OfficeRouter]] runs before paying for a full parse. */
  def looksLikeCfb(blob: Array[Byte]): Boolean =
    blob != null && blob.length >= 8 && {
      var i = 0
      while (i < 8 && blob(i) == Magic(i)) i += 1
      i == 8
    }

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD
  private val DifSect = 0xFFFFFFFC
  private val NoStream = 0xFFFFFFFF

  /** One directory entry surfaced to callers. `path` is '/'-joined
    * from the root (root itself is not included). */
  final case class Entry(
      path: String,
      objectType: Int, // 1 storage, 2 stream (root not surfaced)
      size: Long)

  final case class Parsed(
      majorVersion: Int,
      sectorSize: Int,
      nFatSectors: Int,
      nMiniFatSectors: Int,
      nDirEntries: Int, // used entries incl. root
      entries: Seq[Entry], // DFS order
      streams: Map[String, Array[Byte]]) {
    def nStreams: Int = entries.count(_.objectType == 2)
    def nStorages: Int = entries.count(_.objectType == 1)
  }

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private def u16(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 2 > b.length) bail("truncated_cfb")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 4 > b.length) bail("truncated_cfb")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  }
  private def u64(b: Array[Byte], p: Int): Long =
    (u32(b, p) & 0xffffffffL) | ((u32(b, p + 4) & 0xffffffffL) << 32)

  /** Walk the container. `maxOut` caps TOTAL extracted stream bytes. */
  def parse(blob: Array[Byte], maxOut: Int = 1 << 26): Either[String, Parsed] =
    try {
      if (!looksLikeCfb(blob)) bail("not_cfb") // magic outranks truncation
      if (blob.length < 512) bail("truncated_cfb")
      val major = u16(blob, 26)
      if (u16(blob, 28) != 0xFFFE) bail("bad_byte_order")
      val sectorShift = u16(blob, 30)
      if (!(major == 3 && sectorShift == 9) &&
        !(major == 4 && sectorShift == 12)) bail("bad_version")
      if (u16(blob, 32) != 6) bail("bad_mini_shift")
      val nFat = u32(blob, 44)
      val firstDir = u32(blob, 48)
      val miniCutoff = u32(blob, 56)
      if (miniCutoff != 4096) bail("bad_mini_cutoff")
      val firstMiniFat = u32(blob, 60)
      val nMiniFat = u32(blob, 64)
      val firstDifat = u32(blob, 68)
      val nDifat = u32(blob, 72)
      val ss = 1 << sectorShift

      // sector #i occupies [(i+1)*ss, (i+2)*ss) — the header is sector
      // "-1" (padded to a full sector for major version 4)
      val nSectors = math.max(0L, (blob.length.toLong / ss) - 1).toInt
      def sectorOff(i: Int): Int = {
        if (i < 0 || i >= nSectors) bail("sector_out_of_range")
        (i + 1) * ss
      }

      // ---- DIFAT -> FAT sector list --------------------------------
      if (nFat <= 0 || nFat > nSectors) bail("fat_count_mismatch")
      val fatSectors = new Array[Int](nFat)
      var nFound = 0
      var di = 0
      while (di < 109 && nFound < nFat) {
        val v = u32(blob, 76 + 4 * di)
        if (v != FreeSect) {
          fatSectors(nFound) = v; nFound += 1
        }
        di += 1
      }
      var difatSector = firstDifat
      val seenDifat = new java.util.HashSet[Integer]()
      var nDifatWalked = 0
      while (difatSector != EndOfChain && difatSector != FreeSect &&
        nFound < nFat) {
        if (!seenDifat.add(difatSector)) bail("difat_cycle")
        nDifatWalked += 1
        if (nDifatWalked > nDifat || nDifatWalked > nSectors)
          bail("difat_cycle")
        val off = sectorOff(difatSector)
        var k = 0
        while (k < ss / 4 - 1 && nFound < nFat) {
          val v = u32(blob, off + 4 * k)
          if (v != FreeSect) { fatSectors(nFound) = v; nFound += 1 }
          k += 1
        }
        difatSector = u32(blob, off + ss - 4)
      }
      if (nFound != nFat) bail("fat_count_mismatch")

      // ---- FAT ------------------------------------------------------
      val perFatSector = ss / 4
      val fat = new Array[Int](nFat * perFatSector)
      var fi = 0
      while (fi < nFat) {
        val off = sectorOff(fatSectors(fi))
        var k = 0
        while (k < perFatSector) {
          fat(fi * perFatSector + k) = u32(blob, off + 4 * k)
          k += 1
        }
        fi += 1
      }

      /** Follow a FAT chain from `start`, visiting each sector id. */
      def chain(start: Int, what: String): Seq[Int] = {
        val out = Seq.newBuilder[Int]
        val seen = new java.util.HashSet[Integer]()
        var s = start
        var n = 0
        while (s != EndOfChain) {
          if (s == FreeSect || s == FatSect || s == DifSect)
            bail(s"bad_${what}_chain_entry")
          if (s < 0 || s >= fat.length) bail(s"${what}_chain_out_of_fat")
          if (!seen.add(s)) bail(s"${what}_cycle")
          n += 1
          if (n > nSectors) bail(s"${what}_cycle")
          out += s
          s = fat(s)
        }
        out.result()
      }

      /** Concatenate a FAT chain's sectors, trimmed to `size`. */
      def readChain(start: Int, size: Long, what: String): Array[Byte] = {
        if (size < 0 || size > maxOut) bail("cfb_bomb")
        val secs = chain(start, what)
        if (secs.length.toLong * ss < size) bail(s"${what}_chain_too_short")
        val out = new Array[Byte](size.toInt)
        var wrote = 0
        var i = 0
        while (i < secs.length && wrote < size) {
          val off = sectorOff(secs(i))
          val n = math.min(ss, size.toInt - wrote)
          if (off + n > blob.length) bail("truncated_cfb")
          System.arraycopy(blob, off, out, wrote, n)
          wrote += n
          i += 1
        }
        out
      }

      // ---- directory -----------------------------------------------
      val dirBytes = {
        val secs = chain(firstDir, "directory")
        val out = new Array[Byte](secs.length * ss)
        var i = 0
        while (i < secs.length) {
          val off = sectorOff(secs(i))
          if (off + ss > blob.length) bail("truncated_cfb")
          System.arraycopy(blob, off, out, i * ss, ss)
          i += 1
        }
        out
      }
      val nDirSlots = dirBytes.length / 128
      if (nDirSlots == 0) bail("missing_root")

      final case class Dir(name: String, typ: Int, left: Int, right: Int,
          child: Int, start: Int, size: Long)
      def dirEntry(id: Int): Dir = {
        if (id < 0 || id >= nDirSlots) bail("directory_id_out_of_range")
        val p = id * 128
        val nameLen = u16(dirBytes, p + 64)
        val typ = dirBytes(p + 66) & 0xff
        if (typ != 0 && typ != 1 && typ != 2 && typ != 5)
          bail("bad_object_type")
        if (nameLen > 64 || (nameLen & 1) == 1) bail("bad_name_length")
        val name =
          if (nameLen < 2) ""
          else new String(dirBytes, p, nameLen - 2, "UTF-16LE")
        val size64 = u64(dirBytes, p + 120)
        // v3 writers leave garbage in the high half; spec says ignore
        val size = if (major == 3) size64 & 0xFFFFFFFFL else size64
        Dir(name, typ, u32(dirBytes, p + 68), u32(dirBytes, p + 72),
          u32(dirBytes, p + 76), u32(dirBytes, p + 116), size)
      }

      val root = dirEntry(0)
      if (root.typ != 5) bail("missing_root")

      // mini stream container = the root entry's own FAT stream
      val miniContainer =
        if (root.size == 0) Array.emptyByteArray
        else readChain(root.start, root.size, "ministream")
      val miniFat: Array[Int] =
        if (nMiniFat == 0 || firstMiniFat == EndOfChain) new Array[Int](0)
        else {
          val bytes = {
            val secs = chain(firstMiniFat, "minifat")
            if (secs.length != nMiniFat) bail("minifat_count_mismatch")
            val out = new Array[Byte](secs.length * ss)
            var i = 0
            while (i < secs.length) {
              System.arraycopy(blob, sectorOff(secs(i)), out, i * ss, ss)
              i += 1
            }
            out
          }
          Array.tabulate(bytes.length / 4)(k => u32(bytes, 4 * k))
        }

      def readMiniChain(start: Int, size: Long): Array[Byte] = {
        if (size < 0 || size > maxOut) bail("cfb_bomb")
        val out = new Array[Byte](size.toInt)
        val seen = new java.util.HashSet[Integer]()
        var s = start
        var wrote = 0
        while (wrote < size) {
          if (s == EndOfChain) bail("ministream_chain_too_short")
          if (s < 0 || s >= miniFat.length) bail("ministream_chain_out_of_fat")
          if (!seen.add(s)) bail("ministream_cycle")
          val off = s * 64
          val n = math.min(64, size.toInt - wrote)
          if (off + n > miniContainer.length)
            bail("ministream_out_of_container")
          System.arraycopy(miniContainer, off, out, wrote, n)
          wrote += n
          s = miniFat(s)
        }
        out
      }

      // ---- tree walk (sibling BST + child descent), DFS ------------
      val entries = Seq.newBuilder[Entry]
      val streams = Map.newBuilder[String, Array[Byte]]
      var totalOut = 0L
      val visited = new java.util.HashSet[Integer]()
      var nUsed = 1 // root

      def walk(id: Int, prefix: String, depth: Int): Unit = {
        if (id == NoStream) return
        // a spec-valid red-black sibling tree is O(log n) deep; 1000
        // tolerates naive linked-list writers while keeping hostile
        // deep recursion off the JVM stack (named, not StackOverflow)
        if (depth > 1000) bail("directory_too_deep")
        if (!visited.add(id)) bail("directory_cycle")
        val d = dirEntry(id)
        if (d.typ == 0) bail("unused_entry_in_tree")
        if (d.typ == 5) bail("root_in_tree")
        nUsed += 1
        walk(d.left, prefix, depth + 1)
        val path = if (prefix.isEmpty) d.name else prefix + "/" + d.name
        entries += Entry(path, d.typ, d.size)
        if (d.typ == 2 && d.size > 0) {
          totalOut += d.size
          if (totalOut > maxOut) bail("cfb_bomb")
          val body =
            if (d.size < miniCutoff) readMiniChain(d.start, d.size)
            else readChain(d.start, d.size, "stream")
          streams += path -> body
        } else if (d.typ == 2) streams += path -> Array.emptyByteArray
        if (d.typ == 1) walk(d.child, path, depth + 1)
        walk(d.right, prefix, depth + 1)
      }
      walk(root.child, "", 1)

      Right(Parsed(major, ss, nFat, nMiniFat, nUsed, entries.result(),
        streams.result()))
    } catch { case e: Bail => Left(e.reason) }

  // ==================================================================
  // Fixture writer — spec-faithful v3 (512-byte sectors) container.
  // ==================================================================

  /** CFB directory-name ordering: shorter first, then upper-cased
    * code-unit comparison. */
  private def nameLt(a: String, b: String): Boolean = {
    if (a.length != b.length) a.length < b.length
    else a.toUpperCase.compareTo(b.toUpperCase) < 0
  }

  /** Write a v3 container with the given streams as children of root
    * (no sub-storages — fixtures don't need them; the PARSER handles
    * storages via the child descent above). Streams under 4096 bytes
    * go through the mini stream exactly as the spec demands. */
  def write(streamsIn: Seq[(String, Array[Byte])]): Array[Byte] = {
    val ss = 512
    require(streamsIn.nonEmpty && streamsIn.size <= 200, "fixture-sized only")
    val sorted = streamsIn.sortWith((x, y) => nameLt(x._1, y._1))

    // ---- balanced sibling BST over the sorted names ----------------
    // ids: 0 root, 1..n streams in SORTED order
    val n = sorted.size
    val left = Array.fill(n + 1)(NoStream)
    val right = Array.fill(n + 1)(NoStream)
    def build(lo: Int, hi: Int): Int =
      if (lo > hi) NoStream
      else {
        val mid = (lo + hi) / 2
        left(mid) = build(lo, mid - 1)
        right(mid) = build(mid + 1, hi)
        mid
      }
    val rootChild = build(1, n)

    // ---- allocate bodies -------------------------------------------
    val isMini = sorted.map(_._2.length < 4096)
    // mini stream container: 64-byte-aligned concat of mini bodies
    val miniOffsets = new Array[Int](n)
    var miniBytes = 0
    for (i <- 0 until n if isMini(i)) {
      miniOffsets(i) = miniBytes
      miniBytes += ((sorted(i)._2.length + 63) / 64) * 64
    }
    val nMiniSectors = miniBytes / 64
    val miniContainer = new Array[Byte](miniBytes)
    for (i <- 0 until n if isMini(i))
      System.arraycopy(sorted(i)._2, 0, miniContainer, miniOffsets(i),
        sorted(i)._2.length)

    val nDirSectors = ((n + 1) * 128 + ss - 1) / ss
    val nMiniFatSectors =
      if (nMiniSectors == 0) 0 else (nMiniSectors * 4 + ss - 1) / ss
    val nMiniContainerSectors = (miniBytes + ss - 1) / ss
    val regularLens = sorted.map(_._2.length)
    val nRegularSectors = (0 until n)
      .map(i => if (isMini(i)) 0 else (regularLens(i) + ss - 1) / ss).sum

    // FAT sector count: fixed point of total-sector accounting
    var nFatSectors = 1
    var converged = false
    while (!converged) {
      val total = nFatSectors + nDirSectors + nMiniFatSectors +
        nMiniContainerSectors + nRegularSectors
      val need = (total * 4 + ss - 1) / ss
      if (need == nFatSectors) converged = true else nFatSectors = need
    }
    require(nFatSectors <= 109, "fixture too large for header DIFAT")

    // sector layout: [FAT][directory][miniFAT][mini container][regular]
    val fatStart = 0
    val dirStart = fatStart + nFatSectors
    val miniFatStart = dirStart + nDirSectors
    val miniContainerStart = miniFatStart + nMiniFatSectors
    val regularStart = miniContainerStart + nMiniContainerSectors
    val totalSectors = regularStart + nRegularSectors

    val fat = Array.fill(nFatSectors * (ss / 4))(FreeSect)
    def chainInto(start: Int, count: Int): Unit = {
      var i = 0
      while (i < count) {
        fat(start + i) = if (i == count - 1) EndOfChain else start + i + 1
        i += 1
      }
    }
    for (i <- 0 until nFatSectors) fat(fatStart + i) = FatSect
    chainInto(dirStart, nDirSectors)
    if (nMiniFatSectors > 0) chainInto(miniFatStart, nMiniFatSectors)
    if (nMiniContainerSectors > 0)
      chainInto(miniContainerStart, nMiniContainerSectors)
    // regular streams: one contiguous chain per stream
    val regularStarts = new Array[Int](n)
    var cursor = regularStart
    for (i <- 0 until n if !isMini(i)) {
      val c = (regularLens(i) + ss - 1) / ss
      regularStarts(i) = if (c == 0) EndOfChain else cursor
      chainInto(cursor, c)
      cursor += c
    }

    // miniFAT: one chain per mini stream over its 64-byte sectors
    val miniFat = Array.fill(nMiniFatSectors * (ss / 4))(FreeSect)
    for (i <- 0 until n if isMini(i)) {
      val first = miniOffsets(i) / 64
      val c = (sorted(i)._2.length + 63) / 64
      var k = 0
      while (k < c) {
        miniFat(first + k) = if (k == c - 1) EndOfChain else first + k + 1
        k += 1
      }
    }

    // ---- directory entries ------------------------------------------
    val dirBytes = new Array[Byte](nDirSectors * ss)
    def putU16(p: Int, v: Int): Unit = {
      dirBytes(p) = v.toByte; dirBytes(p + 1) = (v >> 8).toByte
    }
    def putU32(p: Int, v: Int): Unit = {
      dirBytes(p) = v.toByte; dirBytes(p + 1) = (v >> 8).toByte
      dirBytes(p + 2) = (v >> 16).toByte; dirBytes(p + 3) = (v >> 24).toByte
    }
    def putEntry(id: Int, name: String, typ: Int, l: Int, r: Int, c: Int,
        start: Int, size: Long): Unit = {
      val p = id * 128
      val utf16 = name.getBytes("UTF-16LE")
      require(utf16.length <= 62, s"name too long: $name")
      System.arraycopy(utf16, 0, dirBytes, p, utf16.length)
      putU16(p + 64, utf16.length + 2)
      dirBytes(p + 66) = typ.toByte
      dirBytes(p + 67) = 1 // black — sibling links carry the structure
      putU32(p + 68, l); putU32(p + 72, r); putU32(p + 76, c)
      putU32(p + 116, start)
      putU32(p + 120, (size & 0xFFFFFFFFL).toInt)
      putU32(p + 124, (size >>> 32).toInt)
    }
    putEntry(0, "Root Entry", 5, NoStream, NoStream, rootChild,
      if (nMiniContainerSectors == 0) EndOfChain else miniContainerStart,
      miniBytes.toLong)
    for (i <- 0 until n) {
      val (name, body) = sorted(i)
      val start =
        if (body.isEmpty) EndOfChain
        else if (isMini(i)) miniOffsets(i) / 64
        else regularStarts(i)
      putEntry(i + 1, name, 2, left(i + 1), right(i + 1), NoStream,
        start, body.length.toLong)
    }
    // unused tail slots: type 0, sibling/child NOSTREAM per spec
    var slot = n + 1
    while (slot * 128 < dirBytes.length) {
      putU32(slot * 128 + 68, NoStream)
      putU32(slot * 128 + 72, NoStream)
      putU32(slot * 128 + 76, NoStream)
      slot += 1
    }

    // ---- assemble ----------------------------------------------------
    val out = new Array[Byte]((totalSectors + 1) * ss)
    def putHeaderU16(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
    }
    def putHeaderU32(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
      out(p + 2) = (v >> 16).toByte; out(p + 3) = (v >> 24).toByte
    }
    System.arraycopy(Magic, 0, out, 0, 8)
    putHeaderU16(24, 0x003E) // minor version
    putHeaderU16(26, 3) // major version
    putHeaderU16(28, 0xFFFE)
    putHeaderU16(30, 9) // sector shift
    putHeaderU16(32, 6) // mini sector shift
    putHeaderU32(44, nFatSectors)
    putHeaderU32(48, dirStart)
    putHeaderU32(56, 4096)
    putHeaderU32(60, if (nMiniFatSectors == 0) EndOfChain else miniFatStart)
    putHeaderU32(64, nMiniFatSectors)
    putHeaderU32(68, EndOfChain) // no DIFAT sectors at fixture size
    putHeaderU32(72, 0)
    for (i <- 0 until 109)
      putHeaderU32(76 + 4 * i, if (i < nFatSectors) fatStart + i else FreeSect)

    def sectorOff(i: Int): Int = (i + 1) * ss
    for (i <- 0 until fat.length) {
      val off = sectorOff(fatStart) + 4 * i
      out(off) = fat(i).toByte; out(off + 1) = (fat(i) >> 8).toByte
      out(off + 2) = (fat(i) >> 16).toByte; out(off + 3) = (fat(i) >> 24).toByte
    }
    System.arraycopy(dirBytes, 0, out, sectorOff(dirStart), dirBytes.length)
    for (i <- 0 until miniFat.length) {
      val off = sectorOff(miniFatStart) + 4 * i
      out(off) = miniFat(i).toByte; out(off + 1) = (miniFat(i) >> 8).toByte
      out(off + 2) = (miniFat(i) >> 16).toByte
      out(off + 3) = (miniFat(i) >> 24).toByte
    }
    System.arraycopy(miniContainer, 0, out, sectorOff(miniContainerStart),
      miniContainer.length)
    for (i <- 0 until n if !isMini(i)) {
      System.arraycopy(sorted(i)._2, 0, out, sectorOff(regularStarts(i)),
        sorted(i)._2.length)
    }
    out
  }
}
