package graft.operators

import java.nio.charset.{Charset, StandardCharsets}

/** RFC 5322 / MIME (RFC 2045–2047) email walk — the mail-corpus seam:
  * mbox archives and .eml files are a classic large text corpus
  * (mailing-list crawls, enterprise dumps), and a training pipeline
  * needs the same census it gets from WARC: who/what/when headers,
  * decoded subject, the text payload extracted from the multipart tree,
  * and an attachment census WITHOUT decoding attachment content into
  * the text stream.
  *
  * Public-spec subset, reject-don't-guess like [[Warc]]:
  *
  *  - header block terminated by an empty line, folded continuation
  *    lines (leading WSP) unfolded with a single space;
  *  - RFC 2047 encoded-words in Subject (`=?cs?B?…?=` base64,
  *    `=?cs?Q?…?=` quoted-printable-for-headers with `_` = space);
  *    charset labels route through CharsetSniff.Supported's real-world
  *    alias table (UTF-8/latin-1 through Shift_JIS/GBK/Big5/EUC-KR/
  *    windows-125x) and decode STRICTLY — a wrong declaration
  *    quarantines the message rather than mojibaking; labels outside
  *    the table leave the word as-is (disclosed, not guessed);
  *  - multipart bodies split on the declared boundary, parts
  *    walked recursively to depth 3 (deeper nesting → quarantine);
  *  - Content-Transfer-Encoding 7bit/8bit/binary (raw), base64
  *    (decoded; invalid alphabet → quarantine), quoted-printable
  *    (`=XX` + soft line breaks; invalid escape → quarantine);
  *  - `text/plain` leaves feed `text_chars`, `text/html` leaves are
  *    counted but kept OUT of the text stream (boilerplate strip is a
  *    separate stage), anything else — or an explicit
  *    `Content-Disposition: attachment` — is an attachment whose
  *    DECODED byte count is recorded, content discarded.
  *
  * Spark-side shape: per-row `mapPartitions` decode, no shuffle —
  * identical scaling posture to the other codec walks. An mbox file is
  * split into messages by [[splitMbox]] (envelope `From ` lines,
  * mboxrd `>From` unquoting) BEFORE the per-message walk, so one
  * hostile message quarantines one row, never the archive.
  */
object Mime {

  final case class Info(
      fromAddr: String,
      subject: String,
      messageId: String,
      date: String,
      nLeaves: Int,
      maxDepth: Int,
      textChars: Long,
      htmlChars: Long,
      nAttachments: Int,
      attachmentBytes: Long)

  private val MaxDepth = 3

  /** Split an mbox archive into raw messages: a message starts at every
    * line beginning `From ` (the envelope line, which is NOT part of
    * the message), and `>From` body lines lose one `>` (mboxrd). */
  def splitMbox(mbox: String): Seq[String] = {
    if (mbox == null) return Seq.empty
    val lines = mbox.split("\n", -1)
    val out = Seq.newBuilder[String]
    var cur: StringBuilder = null
    for (ln <- lines) {
      if (ln.startsWith("From ")) {
        if (cur != null) out += cur.result().stripSuffix("\n")
        cur = new StringBuilder
      } else if (cur != null) {
        val unquoted =
          if (ln.matches(">+From .*")) ln.substring(1) else ln
        cur.append(unquoted).append('\n')
      }
    }
    if (cur != null) out += cur.result().stripSuffix("\n")
    out.result()
  }

  /** Header block + rest. Headers are unfolded (continuation lines
    * joined with one space) and keyed lowercase, LAST occurrence wins.
    * None when no empty-line separator exists or a non-continuation
    * line has no colon. */
  private def parseHeaders(raw: String): Option[(Map[String, String], String)] = {
    val norm = raw.replace("\r\n", "\n")
    val sep = norm.indexOf("\n\n")
    if (sep < 0) return None
    val (head, body) = (norm.substring(0, sep), norm.substring(sep + 2))
    val unfolded = Seq.newBuilder[String]
    for (ln <- head.split("\n", -1)) {
      if (ln.startsWith(" ") || ln.startsWith("\t")) {
        val prev = unfolded.result()
        if (prev.isEmpty) return None
        unfolded.clear()
        prev.init.foreach(unfolded += _)
        unfolded += prev.last + " " + ln.trim
      } else unfolded += ln
    }
    val m = Map.newBuilder[String, String]
    for (ln <- unfolded.result() if ln.nonEmpty) {
      val c = ln.indexOf(':')
      if (c <= 0) return None
      m += ln.substring(0, c).trim.toLowerCase -> ln.substring(c + 1).trim
    }
    Some((m.result(), body))
  }

  private val EncodedWord = "=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=".r

  /** RFC 2047 charset labels route through the charset sniffer's
    * real-world alias table (CharsetSniff.Supported) — Shift_JIS / GBK /
    * Big5 / EUC-KR / windows-125x subjects decode STRICTLY instead of
    * passing through undecoded. RFC 2047 also allows an RFC 2231
    * language suffix (`=?utf-8*en?B?...?=`) — stripped before lookup. */
  private def charsetOf(name: String): Option[String] = {
    val label = name.takeWhile(_ != '*').trim.toLowerCase(java.util.Locale.ROOT)
    CharsetSniff.Supported.get(label)
      .filter(Charset.isSupported)
  }

  /** Decode RFC 2047 encoded-words; whitespace BETWEEN two encoded
    * words is transparent (per spec). Unknown charsets leave the word
    * untouched; a malformed payload inside a word — including bytes the
    * DECLARED charset rejects under strict decoding — yields None
    * (quarantine — a header that lies about its encoding). */
  def decodeEncodedWords(s: String): Option[String] = {
    // drop whitespace between adjacent encoded words first
    val joined = s.replaceAll("\\?=\\s+=\\?", "?==?")
    val sb = new StringBuilder
    var last = 0
    for (m <- EncodedWord.findAllMatchIn(joined)) {
      sb.append(joined.substring(last, m.start))
      charsetOf(m.group(1)) match {
        case None => sb.append(m.matched)
        case Some(javaName) =>
          val payload = m.group(3)
          val bytes: Array[Byte] =
            if (m.group(2).equalsIgnoreCase("B")) {
              try java.util.Base64.getDecoder.decode(payload)
              catch { case _: IllegalArgumentException => return None }
            } else {
              decodeQp(payload.replace('_', ' '), softBreaks = false)
                .getOrElse(return None)
            }
          sb.append(CharsetSniff.decodeStrict(bytes, 0, javaName)
            .getOrElse(return None))
      }
      last = m.end
    }
    sb.append(joined.substring(last))
    Some(sb.toString)
  }

  /** Quoted-printable decode to bytes. `softBreaks` enables `=\n`
    * (body form); the header Q form has none. Invalid `=XX` → None. */
  private def decodeQp(s: String, softBreaks: Boolean): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    val t = s.replace("\r\n", "\n")
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '=') {
        if (softBreaks && i + 1 < t.length && t.charAt(i + 1) == '\n') i += 2
        else if (i + 3 <= t.length) {
          val v = try Integer.parseInt(t.substring(i + 1, i + 3), 16) catch {
            case _: NumberFormatException => return None
          }
          out.write(v)
          i += 3
        } else return None
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    Some(out.toByteArray)
  }

  private def param(headerValue: String, name: String): Option[String] = {
    val r = (s"""(?i)$name="([^"]*)"""").r
    val r2 = (s"""(?i)$name=([^";\\s]+)""").r
    r.findFirstMatchIn(headerValue).map(_.group(1))
      .orElse(r2.findFirstMatchIn(headerValue).map(_.group(1)))
  }

  private def mediaType(headers: Map[String, String]): String =
    headers.getOrElse("content-type", "text/plain")
      .split(";")(0).trim.toLowerCase

  /** Accumulator for the recursive part walk. */
  private final class Acc {
    var leaves = 0
    var depth = 1
    var text = 0L
    var html = 0L
    var nAtt = 0
    var attBytes = 0L
  }

  private def walkPart(
      headers: Map[String, String], body: String,
      depth: Int, acc: Acc): Boolean = {
    if (depth > MaxDepth) return false
    if (depth > acc.depth) acc.depth = depth
    val mt = mediaType(headers)
    if (mt.startsWith("multipart/")) {
      val boundary = param(headers.getOrElse("content-type", ""), "boundary")
        .getOrElse(return false)
      val delim = "--" + boundary
      val lines = body.replace("\r\n", "\n").split("\n", -1)
      val starts = lines.zipWithIndex.collect {
        case (l, i) if l == delim || l == delim + "--" => (l == delim + "--", i)
      }
      // close-delimiter required (reject an unterminated multipart),
      // preamble before the first delimiter and epilogue after the
      // close are transparent per RFC 2046
      val closeAt = starts.find(_._1).map(_._2).getOrElse(return false)
      val opens = starts.collect { case (false, i) if i < closeAt => i }
      if (opens.isEmpty) return false // boundary never opens a part
      val ends = opens.drop(1) :+ closeAt
      for ((s, e) <- opens.zip(ends)) {
        val partRaw = lines.slice(s + 1, e).mkString("\n")
        parseHeaders(partRaw) match {
          case Some((ph, pb)) => if (!walkPart(ph, pb, depth + 1, acc)) return false
          case None => return false
        }
      }
      true
    } else {
      val enc = headers.getOrElse("content-transfer-encoding", "7bit")
        .trim.toLowerCase
      val decoded: Option[Array[Byte]] = enc match {
        case "7bit" | "8bit" | "binary" =>
          Some(body.getBytes(StandardCharsets.UTF_8))
        case "base64" =>
          try Some(java.util.Base64.getMimeDecoder.decode(body.trim))
          catch { case _: IllegalArgumentException => None }
        case "quoted-printable" => decodeQp(body, softBreaks = true)
        case _ => None
      }
      val bytes = decoded.getOrElse(return false)
      acc.leaves += 1
      val disp = headers.getOrElse("content-disposition", "")
        .split(";")(0).trim.toLowerCase
      if (disp == "attachment" || (mt != "text/plain" && mt != "text/html")) {
        acc.nAtt += 1
        acc.attBytes += bytes.length
      } else if (mt == "text/plain") {
        acc.text += new String(bytes, StandardCharsets.UTF_8)
          .stripSuffix("\n").length
      } else {
        acc.html += new String(bytes, StandardCharsets.UTF_8)
          .stripSuffix("\n").length
      }
      true
    }
  }

  /** Angle-addr if present, else the whole trimmed value. */
  private def addrOf(v: String): String = {
    val m = "<([^>]*)>".r.findFirstMatchIn(v)
    m.map(_.group(1)).getOrElse(v.trim)
  }

  /** Unfolded header map of a raw message (lowercase keys), without
    * walking the body — the thread-reconstruction entry point
    * (Message-ID / In-Reply-To / References chains). None = no
    * header/body separator or a malformed header line. */
  def headers(raw: String): Option[Map[String, String]] =
    if (raw == null || raw.isEmpty) None else parseHeaders(raw).map(_._1)

  /** Walk one raw RFC 5322 message. None = quarantine. */
  def info(raw: String): Option[Info] = {
    if (raw == null || raw.isEmpty) return None
    val (headers, body) = parseHeaders(raw).getOrElse(return None)
    if (!headers.contains("from") && !headers.contains("message-id"))
      return None // not mail — reject, don't guess
    val subject = decodeEncodedWords(headers.getOrElse("subject", ""))
      .getOrElse(return None)
    val acc = new Acc
    if (!walkPart(headers, body, 1, acc)) return None
    Some(Info(
      fromAddr = addrOf(headers.getOrElse("from", "")),
      subject = subject,
      messageId = headers.getOrElse("message-id", ""),
      date = headers.getOrElse("date", ""),
      nLeaves = acc.leaves,
      maxDepth = acc.depth,
      textChars = acc.text,
      htmlChars = acc.html,
      nAttachments = acc.nAtt,
      attachmentBytes = acc.attBytes))
  }

  // ---- deterministic fixture builders (spec + catalog use) ----

  def qWord(s: String): String =
    "=?UTF-8?Q?" + s.flatMap {
      case ' ' => "_"
      case c if c == '=' || c == '?' || c == '_' || c > 126 || c < 32 =>
        (new String(Array(c)).getBytes(StandardCharsets.UTF_8))
          .map(b => f"=${b & 0xff}%02X").mkString
      case c => c.toString
    } + "?="

  def bWord(s: String): String =
    "=?UTF-8?B?" + java.util.Base64.getEncoder
      .encodeToString(s.getBytes(StandardCharsets.UTF_8)) + "?="

  /** B-word in an arbitrary supported charset label (fixture builder for
    * the non-Latin header regimes — Shift_JIS/GBK/EUC-KR subjects). */
  def bWordIn(s: String, label: String): String = {
    val javaName = CharsetSniff.Supported(
      label.toLowerCase(java.util.Locale.ROOT))
    s"=?$label?B?" + java.util.Base64.getEncoder
      .encodeToString(s.getBytes(javaName)) + "?="
  }

  def base64Body(bytes: Array[Byte]): String =
    java.util.Base64.getMimeEncoder(60, "\n".getBytes).encodeToString(bytes)
}
