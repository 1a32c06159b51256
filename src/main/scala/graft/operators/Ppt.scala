package graft.operators

/** Legacy `.ppt` (PowerPoint 97-2003 binary, [MS-PPT]) text
  * extraction over a [[Cfb]] container — the last `ole2_*` stopgap in
  * [[OfficeRouter]]. The `PowerPoint Document` stream is a tree of
  * records, each led by an 8-byte header (recVer/recInstance u16,
  * recType u16, recLen u32); recVer 0xF marks a CONTAINER whose body
  * is more records. Slide body text lives in TextCharsAtom (0x0FA0,
  * UTF-16LE) and TextBytesAtom (0x0FA8, one byte per char — the low
  * bytes of UTF-16) atoms; slides are counted via SlidePersistAtom
  * (0x03F3) inside SlideListWithText.
  *
  * Scope (honest): a linear walk of the record tree in stream order,
  * collecting every text atom — the shape real extractors use for
  * corpus text. Fast-save edit chains (UserEditAtom indirection)
  * still land here because the atoms remain in the stream; ordering
  * across edits follows the stream, not the edit chain (disclosed).
  * Encryption (CryptSession10Container) rejects by name. No .ppt
  * generator exists on-system — construct-and-cross-check, the
  * [[Cfb]]/[[Xls]] playbook.
  */
object Ppt {

  final case class Extracted(
      text: String, // text atoms joined '\n'
      nSlides: Long,
      nTextAtoms: Long,
      nRecords: Long)

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val RecDocument = 0x03E8
  private val RecSlideListWithText = 0x0FF0
  private val RecSlidePersistAtom = 0x03F3
  private val RecTextHeaderAtom = 0x0F9F
  private val RecTextCharsAtom = 0x0FA0
  private val RecTextBytesAtom = 0x0FA8
  private val RecCryptSession = 0x2F14

  private def u16(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 2 > b.length) bail("truncated_record")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], p: Int): Long = {
    if (p < 0 || p + 4 > b.length) bail("truncated_record")
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  }

  def extract(blob: Array[Byte], maxOut: Int = 1 << 26)
      : Either[Rejected, Extracted] =
    Cfb.parse(blob, maxOut) match {
      case Left(reason) => Left(Rejected(s"cfb_$reason"))
      case Right(parsed) => extractFromCfb(parsed)
    }

  def extractFromCfb(parsed: Cfb.Parsed): Either[Rejected, Extracted] =
    try {
      val doc = parsed.streams.getOrElse("PowerPoint Document",
        bail("missing_powerpoint_document"))
      val texts = Seq.newBuilder[String]
      var nSlides = 0L
      var nAtoms = 0L
      var nRecords = 0L

      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 64) bail("record_tree_too_deep")
        var p = start
        while (p < end) {
          if (p + 8 > end) bail("truncated_record")
          val verInst = u16(doc, p)
          val typ = u16(doc, p + 2)
          val len = u32(doc, p + 4)
          val body = p + 8
          if (len < 0 || body + len > end) bail("record_overruns_parent")
          nRecords += 1
          val isContainer = (verInst & 0x0F) == 0x0F
          typ match {
            case RecCryptSession => bail("ppt_encrypted")
            case RecSlidePersistAtom => nSlides += 1
            case RecTextCharsAtom =>
              if (len % 2 != 0) bail("bad_text_atom")
              nAtoms += 1
              texts += new String(doc, body, len.toInt, "UTF-16LE")
            case RecTextBytesAtom =>
              nAtoms += 1
              val sb = new java.lang.StringBuilder(len.toInt)
              var k = 0
              while (k < len) {
                sb.append(((doc(body + k) & 0xff)).toChar); k += 1
              }
              texts += sb.toString
            case _ if isContainer => walk(body, (body + len).toInt, depth + 1)
            case _ => () // opaque atom
          }
          p = body + len.toInt
        }
      }
      walk(0, doc.length, 0)
      if (nRecords == 0) bail("empty_powerpoint_stream")
      Right(Extracted(texts.result().mkString("\n"), nSlides, nAtoms,
        nRecords))
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  // ==================================================================
  // Fixture writer
  // ==================================================================

  private def rec(ver: Int, inst: Int, typ: Int,
      body: Array[Byte]): Array[Byte] = {
    val vi = (ver & 0xF) | (inst << 4)
    Array[Byte](vi.toByte, (vi >> 8).toByte, typ.toByte, (typ >> 8).toByte,
      body.length.toByte, (body.length >> 8).toByte,
      (body.length >> 16).toByte, (body.length >> 24).toByte) ++ body
  }

  /** Write a PowerPoint Document stream (in a real CFB, with the
    * required `Current User` sibling): a Document container holding a
    * SlideListWithText with one SlidePersistAtom + text atom per
    * slide — UTF-16 atoms for non-latin text, byte atoms otherwise
    * (alternating when both are possible), plus an opaque decoy atom
    * the walk must skip. */
  def write(slides: Seq[String]): Array[Byte] = {
    val slideRecs = slides.zipWithIndex.map { case (text, i) =>
      val persist = rec(0, 0, RecSlidePersistAtom,
        Array.fill[Byte](20)(0).updated(16, (i + 1).toByte))
      val header = rec(0, 0, RecTextHeaderAtom, Array.fill[Byte](4)(0))
      val ascii = text.forall(_ < 0x100)
      val atom =
        if (ascii && i % 2 == 0)
          rec(0, 0, RecTextBytesAtom, text.map(_.toByte).toArray)
        else rec(0, 0, RecTextCharsAtom, text.getBytes("UTF-16LE"))
      persist ++ header ++ atom
    }
    val decoy = rec(0, 0, 0x0FBA, "decoy not text".getBytes) // CString
    val slwt = rec(0xF, 0, RecSlideListWithText,
      slideRecs.foldLeft(Array.emptyByteArray)(_ ++ _))
    val document = rec(0xF, 0, RecDocument, decoy ++ slwt)
    Cfb.write(Seq(
      "PowerPoint Document" -> document,
      "Current User" -> Array.fill[Byte](24)(0x5A)))
  }
}
