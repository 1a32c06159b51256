package graft.operators

/** SQLite database file census — `.sqlite`/`.db` files are among the
  * most common structured binaries in a crawl after office documents,
  * and a curation pipeline wants to KNOW what a database carries
  * (schema, table sizes) without shipping an embedded engine.
  * Grammar per the public SQLite file-format document
  * (fileformat2.html):
  *
  *   header  = 100 bytes: magic "SQLite format 3\0", page size
  *             (u16BE, 1 = 65536), reserved-bytes-per-page, page
  *             count, text encoding (1/2/3 = UTF-8/16LE/16BE),
  *             schema cookie, user version
  *   b-tree  = page type 2/5/10/13 (interior/leaf x index/table),
  *             cell pointer array, table-leaf cells =
  *             varint(payload) + varint(rowid) + record
  *   record  = varint(header size) + serial-type varints + body
  *             (ints 1-8 bytes, float64, const 0/1, text/blob)
  *   spill   = payloads above the page's local threshold continue in
  *             overflow-page chains (the U/X/M/K formulas implemented
  *             exactly — the classic corpus-parser bug is truncating
  *             long CREATE statements in sqlite_master)
  *
  * The census walks the `sqlite_master` table on page 1 for schema
  * objects, then each table b-tree to count rows. Freelist, WAL
  * sidecars, pointer-map pages (incremental-vacuum) and index
  * contents are out of scope (schema census only); encrypted or
  * corrupt files quarantine by name. Every page visit is
  * cycle-guarded and bounds-checked; total decoded payload is capped
  * (`sqlite_bomb`).
  *
  * Cross-checked against the REAL engine: the on-system CPython
  * `sqlite3` builds databases (multi-level b-trees, overflowing
  * schema rows, all three encodings) that the spec reads back
  * (SqliteSpec shells out), and tools/verify_sqlite.py opens the
  * Scala writer's fixtures with the real engine.
  */
object Sqlite {

  final case class SchemaObject(
      objType: String, // table / index / view / trigger
      name: String,
      tblName: String,
      rootPage: Long,
      sql: String)

  final case class TableCount(name: String, nRows: Long)

  final case class Info(
      pageSize: Int,
      nPages: Long,
      encoding: String, // utf-8 / utf-16le / utf-16be
      userVersion: Long,
      schema: Seq[SchemaObject],
      tableRows: Seq[TableCount]) {
    def nTables: Int = schema.count(_.objType == "table")
    def nIndexes: Int = schema.count(_.objType == "index")
  }

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val Magic = "SQLite format 3".getBytes("US-ASCII") :+ 0.toByte

  private def u16(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 2 > b.length) bail("truncated_sqlite")
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  }
  private def u32(b: Array[Byte], p: Int): Long = {
    if (p < 0 || p + 4 > b.length) bail("truncated_sqlite")
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  }

  def looksLikeSqlite(blob: Array[Byte]): Boolean =
    blob != null && blob.length >= 16 && {
      var i = 0
      while (i < 16 && blob(i) == Magic(i)) i += 1
      i == 16
    }

  def parse(blob: Array[Byte], maxOut: Int = 1 << 26)
      : Either[String, Info] =
    try {
      if (!looksLikeSqlite(blob)) bail("not_sqlite")
      if (blob.length < 512) bail("truncated_sqlite")
      val rawPageSize = u16(blob, 16)
      val pageSize =
        if (rawPageSize == 1) 65536
        else if (rawPageSize >= 512 && rawPageSize <= 32768 &&
          Integer.bitCount(rawPageSize) == 1) rawPageSize
        else bail("bad_page_size")
      val reserved = blob(20) & 0xff
      val usable = pageSize - reserved
      if (usable < 480) bail("bad_page_size")
      val declaredPages = u32(blob, 28)
      val filePages = blob.length.toLong / pageSize
      // the declared count is valid only when the change counters
      // agree (legacy writers left it stale); fall back to file size
      val nPages =
        if (declaredPages > 0 && u32(blob, 24) == u32(blob, 92) &&
          declaredPages <= filePages) declaredPages
        else filePages
      if (nPages < 1) bail("truncated_sqlite")
      val encoding = u32(blob, 56) match {
        case 1 => "utf-8"
        case 2 => "utf-16le"
        case 3 => "utf-16be"
        case 0 => "utf-8" // empty db: encoding not yet set
        case e => bail(s"encoding_unsupported_$e")
      }
      val charset = encoding match {
        case "utf-8" => "UTF-8"
        case "utf-16le" => "UTF-16LE"
        case _ => "UTF-16BE"
      }
      val userVersion = u32(blob, 60)

      def pageOff(page: Long): Int = {
        if (page < 1 || page > nPages) bail("page_out_of_range")
        val off = (page - 1) * pageSize
        if (off + pageSize > blob.length) bail("truncated_sqlite")
        off.toInt
      }

      var totalPayload = 0L

      def varint(p0: Int, end: Int): (Long, Int) = {
        var v = 0L
        var p = p0
        var k = 0
        while (k < 8) {
          if (p >= end) bail("truncated_record")
          val x = blob(p) & 0xff
          p += 1
          if ((x & 0x80) == 0) return ((v << 7) | x, p)
          v = (v << 7) | (x & 0x7f)
          k += 1
        }
        // 9th byte carries a full 8 bits
        if (p >= end) bail("truncated_record")
        ((v << 8) | (blob(p) & 0xff), p + 1)
      }

      /** Assemble a cell payload, following overflow chains. `local`
        * bytes live in the page; the rest chains 4-byte-linked
        * overflow pages. */
      def payloadBytes(cellPage: Int, at: Int, payloadLen: Long,
          pageEnd: Int): Array[Byte] = {
        if (payloadLen < 0 || payloadLen > (1 << 24)) bail("sqlite_bomb")
        totalPayload += payloadLen
        if (totalPayload > maxOut) bail("sqlite_bomb")
        val p = payloadLen.toInt
        val x = usable - 35
        val local =
          if (p <= x) p
          else {
            val m = (usable - 12) * 32 / 255 - 23
            val k = m + (p - m) % (usable - 4)
            if (k <= x) k else m
          }
        if (at + local + (if (local < p) 4 else 0) > pageEnd)
          bail("cell_overruns_page")
        val out = new Array[Byte](p)
        System.arraycopy(blob, at, out, 0, local)
        var filled = local
        if (local < p) {
          var next = u32(blob, at + local)
          val seen = new java.util.HashSet[java.lang.Long]()
          while (filled < p) {
            if (next == 0) bail("overflow_chain_short")
            if (!seen.add(next)) bail("overflow_cycle")
            val off = pageOff(next)
            val take = math.min(p - filled, usable - 4)
            if (off + 4 + take > blob.length) bail("truncated_sqlite")
            System.arraycopy(blob, off + 4, out, filled, take)
            filled += take
            next = u32(blob, off)
          }
        }
        out
      }

      /** Decode one record into column values (as AnyRef: java.lang
        * Long/Double/String/byte[]/null). */
      def record(payload: Array[Byte]): IndexedSeq[AnyRef] = {
        def vi(p0: Int): (Long, Int) = {
          var v = 0L
          var p = p0
          var k = 0
          while (k < 8) {
            if (p >= payload.length) bail("truncated_record")
            val x = payload(p) & 0xff
            p += 1
            if ((x & 0x80) == 0) return ((v << 7) | x, p)
            v = (v << 7) | (x & 0x7f)
            k += 1
          }
          if (p >= payload.length) bail("truncated_record")
          ((v << 8) | (payload(p) & 0xff), p + 1)
        }
        val (hdrLen, afterHdrLen) = vi(0)
        if (hdrLen < 1 || hdrLen > payload.length) bail("truncated_record")
        val types = IndexedSeq.newBuilder[Long]
        var p = afterHdrLen
        while (p < hdrLen) {
          val (t, np) = vi(p)
          types += t
          p = np
        }
        var body = hdrLen.toInt
        types.result().map { t =>
          def intBytes(n: Int): Long = {
            if (body + n > payload.length) bail("truncated_record")
            var v = if (n > 0 && payload(body) < 0) -1L else 0L
            var k = 0
            while (k < n) { v = (v << 8) | (payload(body + k) & 0xff); k += 1 }
            body += n
            v
          }
          t match {
            case 0 => null
            case 1 => java.lang.Long.valueOf(intBytes(1))
            case 2 => java.lang.Long.valueOf(intBytes(2))
            case 3 => java.lang.Long.valueOf(intBytes(3))
            case 4 => java.lang.Long.valueOf(intBytes(4))
            case 5 => java.lang.Long.valueOf(intBytes(6))
            case 6 => java.lang.Long.valueOf(intBytes(8))
            case 7 => java.lang.Double.valueOf(
              java.lang.Double.longBitsToDouble(intBytes(8)))
            case 8 => java.lang.Long.valueOf(0L)
            case 9 => java.lang.Long.valueOf(1L)
            case t if t >= 13 && t % 2 == 1 =>
              // bound in Long BEFORE narrowing: t near 2^33 makes the
              // Int-narrowed length wrap negative (hostile record)
              val nL = (t - 13) / 2
              if (nL > payload.length - body) bail("truncated_record")
              val n = nL.toInt
              val s = new String(payload, body, n, charset)
              body += n
              s
            case t if t >= 12 && t % 2 == 0 =>
              val nL = (t - 12) / 2
              if (nL > payload.length - body) bail("truncated_record")
              val n = nL.toInt
              val out = java.util.Arrays.copyOfRange(payload, body, body + n)
              body += n
              out
            case _ => bail("bad_serial_type")
          }
        }
      }

      /** Walk a table b-tree; `onRow` gets each leaf cell's record
        * payload (null when counting only). Returns the row count. */
      def walkTable(root: Long, decode: Boolean,
          onRow: IndexedSeq[AnyRef] => Unit): Long = {
        var rows = 0L
        val seen = new java.util.HashSet[java.lang.Long]()
        def page(pg: Long, depth: Int): Unit = {
          if (depth > 32) bail("btree_too_deep")
          if (!seen.add(pg)) bail("btree_cycle")
          val off = pageOff(pg)
          val hdr = if (pg == 1) off + 100 else off
          val typ = blob(hdr) & 0xff
          val nCells = u16(blob, hdr + 3)
          val pageEnd = off + usable
          typ match {
            case 13 => // table leaf
              var c = 0
              while (c < nCells) {
                rows += 1
                if (decode) {
                  val cp = off + u16(blob, hdr + 8 + 2 * c)
                  if (cp < off || cp >= pageEnd) bail("cell_out_of_page")
                  val (plen, p1) = varint(cp, pageEnd)
                  val (_, p2) = varint(p1, pageEnd) // rowid
                  onRow(record(payloadBytes(off, p2, plen, pageEnd)))
                }
                c += 1
              }
            case 5 => // table interior
              var c = 0
              while (c < nCells) {
                val cp = off + u16(blob, hdr + 12 + 2 * c)
                if (cp < off || cp + 4 > pageEnd) bail("cell_out_of_page")
                page(u32(blob, cp), depth + 1)
                c += 1
              }
              page(u32(blob, hdr + 8), depth + 1) // right-most
            case 2 | 10 => bail("index_btree_as_table")
            case _ => bail("bad_btree_page_type")
          }
        }
        page(root, 1)
        rows
      }

      // ---- sqlite_master on page 1 -----------------------------------
      val schema = Seq.newBuilder[SchemaObject]
      walkTable(1, decode = true, { cols =>
        if (cols.length < 5) bail("bad_master_record")
        def str(a: AnyRef): String = a match {
          case s: String => s
          case null => ""
          case _ => bail("bad_master_record")
        }
        val root = cols(3) match {
          case l: java.lang.Long => l.longValue()
          case null => 0L
          case _ => bail("bad_master_record")
        }
        schema += SchemaObject(str(cols(0)), str(cols(1)), str(cols(2)),
          root, str(cols(4)))
      })
      val objects = schema.result()

      val counts = objects.filter(o => o.objType == "table" && o.rootPage > 0)
        .map { o =>
          TableCount(o.name, walkTable(o.rootPage, decode = false, _ => ()))
        }

      Right(Info(pageSize, nPages, encoding, userVersion, objects, counts))
    } catch { case e: Bail => Left(e.reason) }

  // ==================================================================
  // Fixture writer — a minimal-but-real single-file database
  // ==================================================================

  /** Write a database: one user table per entry of `tables`, each
    * `(name, rows)` with rows of (rowid INTEGER, one TEXT column).
    * All leaf pages (fixture-sized); page 1 carries sqlite_master.
    * The REAL engine opens these (tools/verify_sqlite.py). */
  def write(tables: Seq[(String, Seq[String])],
      pageSize: Int = 4096): Array[Byte] = {
    require(Integer.bitCount(pageSize) == 1 && pageSize >= 512)
    val nTables = tables.size
    val nPages = 1 + nTables // page 1 = master; one leaf per table

    def varint(v: Long): Array[Byte] = {
      if (v < 0x80) Array(v.toByte)
      else {
        val out = Seq.newBuilder[Byte]
        var shift = 63 / 7 * 7
        var started = false
        while (shift > 0) {
          val part = ((v >>> shift) & 0x7f).toInt
          if (part != 0 || started) { out += (part | 0x80).toByte; started = true }
          shift -= 7
        }
        out += (v & 0x7f).toByte
        out.result().toArray
      }
    }

    def textSerial(s: Array[Byte]): Long = 13L + 2 * s.length

    /** A record of (text, ...) cols given (serialType, bodyBytes). */
    def rec(cols: Seq[(Long, Array[Byte])]): Array[Byte] = {
      val typeBytes = cols.map(c => varint(c._1))
      // header length includes its own varint; sizes here stay 1-byte
      val hdrLen = 1 + typeBytes.map(_.length).sum
      require(hdrLen < 0x80)
      Array(hdrLen.toByte) ++ typeBytes.flatten ++ cols.flatMap(_._2)
    }

    def leafPage(cells: Seq[Array[Byte]], isPage1: Boolean): Array[Byte] = {
      val page = new Array[Byte](pageSize)
      val hdrBase = if (isPage1) 100 else 0
      page(hdrBase) = 13
      val n = cells.size
      page(hdrBase + 3) = (n >> 8).toByte
      page(hdrBase + 4) = n.toByte
      var content = pageSize
      val ptrs = new Array[Int](n)
      cells.zipWithIndex.foreach { case (cell, i) =>
        content -= cell.length
        System.arraycopy(cell, 0, page, content, cell.length)
        ptrs(i) = content
      }
      require(content >= hdrBase + 8 + 2 * n, "fixture page overflow")
      page(hdrBase + 5) = (content >> 8).toByte
      page(hdrBase + 6) = content.toByte
      ptrs.zipWithIndex.foreach { case (p, i) =>
        page(hdrBase + 8 + 2 * i) = (p >> 8).toByte
        page(hdrBase + 8 + 2 * i + 1) = p.toByte
      }
      page
    }

    def cell(rowid: Long, payload: Array[Byte]): Array[Byte] =
      varint(payload.length.toLong) ++ varint(rowid) ++ payload

    // master rows: type,name,tbl_name,rootpage,sql
    val masterCells = tables.zipWithIndex.map { case ((name, _), i) =>
      val nameB = name.getBytes("UTF-8")
      val sqlB = s"CREATE TABLE $name (id INTEGER PRIMARY KEY, body TEXT)"
        .getBytes("UTF-8")
      val payload = rec(Seq(
        (textSerial("table".getBytes("UTF-8")), "table".getBytes("UTF-8")),
        (textSerial(nameB), nameB),
        (textSerial(nameB), nameB),
        (1L, Array((2 + i).toByte)), // rootpage as 1-byte int
        (textSerial(sqlB), sqlB)))
      cell(i + 1L, payload)
    }
    val page1 = leafPage(masterCells, isPage1 = true)

    val tablePages = tables.zipWithIndex.map { case ((_, rows), _) =>
      val cells = rows.zipWithIndex.map { case (body, r) =>
        val b = body.getBytes("UTF-8")
        // (NULL id -> rowid alias, text body)
        cell(r + 1L, rec(Seq((0L, Array.emptyByteArray),
          (textSerial(b), b))))
      }
      leafPage(cells, isPage1 = false)
    }

    val out = new Array[Byte](nPages * pageSize)
    System.arraycopy(page1, 0, out, 0, pageSize)
    tablePages.zipWithIndex.foreach { case (p, i) =>
      System.arraycopy(p, 0, out, (i + 1) * pageSize, pageSize)
    }
    // 100-byte header over page 1's start
    System.arraycopy(Magic, 0, out, 0, 16)
    out(16) = (pageSize >> 8).toByte; out(17) = pageSize.toByte
    out(18) = 1; out(19) = 1 // file format versions (legacy)
    out(21) = 64; out(22) = 32; out(23) = 32 // fractions (fixed by spec)
    // change counter (24) == version-valid-for (92) -> page count valid
    out(27) = 1
    out(31) = nPages.toByte // page count at 28 (fixture < 256 pages)
    out(47) = 1 // schema format 1 at 44
    out(56 + 3) = 1 // text encoding utf-8 at 56
    out(95) = 1 // version-valid-for at 92 == change counter
    // sqlite version number at 96 (3.40.0 -> 3040000)
    val ver = 3040000L
    out(96) = (ver >> 24).toByte; out(97) = (ver >> 16).toByte
    out(98) = (ver >> 8).toByte; out(99) = ver.toByte
    // schema cookie at 40: bump per schema change, any value works
    out(43) = 1
    out
  }
}
