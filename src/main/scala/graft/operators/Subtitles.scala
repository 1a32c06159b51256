package graft.operators

/** SRT / WebVTT subtitle parsing — the transcript side of a multimodal
  * crawl: cue timings, speech coverage, gap structure, and tag-stripped
  * text volume per media asset, no media decode involved.
  *
  * Reference obligation: none (beyond-reference training-data mandate —
  * the reference ETL at flat_obs_v1.2.sql has no media path at all);
  * the format grammars are the public SubRip de-facto spec and the
  * W3C WebVTT recommendation.
  *
  * Same contract as the other container walks (Warc/Mp3/Mp4):
  * reject-don't-guess — a malformed index line, timing arrow, reversed
  * interval, or missing header returns None and the caller quarantines
  * the record; we never emit half-parsed cues. Both grammars are
  * line-structured, so the walk is a single pass over the split lines
  * with O(1) state — per-record cost is linear in the payload and the
  * operator composes with mapPartitions exactly like the codec walks
  * (no shuffle, embarrassingly parallel at any corpus size).
  *
  * Accepted subset (documented, spec-pinned):
  *  - SRT: numeric index line, `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing,
  *    >=1 text lines, blank-line separated blocks; CRLF tolerated.
  *  - WebVTT: `WEBVTT` header line (optional trailing text), NOTE
  *    blocks (skipped, counted), optional cue-identifier line, timing
  *    with `.` millis and optional hours (`MM:SS.mmm`), optional cue
  *    settings after the end timestamp.
  *  - Inline markup (`<i>`, `<b>`, `<v Name>`, ...) is stripped for the
  *    character count; cues that carried any tag are counted.
  */
object Subtitles {

  final case class SubInfo(
      fmt: String,
      nCues: Int,
      nNotes: Int,
      firstStartMs: Long,
      lastEndMs: Long,
      speechMs: Long,
      textChars: Long,
      nTagged: Int,
      maxGapMs: Long)

  private val SrtTime =
    """(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2}):(\d{2}):(\d{2}),(\d{3})""".r
  // VTT: hours optional on either side, optional cue settings after end
  private val VttTime =
    """(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3}) --> (?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})(?:[ \t].*)?""".r
  private val Tag = "<[^>]*>".r

  private def ms(h: String, m: String, s: String, f: String): Option[Long] = {
    val hh = if (h == null) 0L else h.toLong
    val mm = m.toLong; val ss = s.toLong
    if (mm > 59 || ss > 59) None
    else Some(((hh * 60 + mm) * 60 + ss) * 1000 + f.toLong)
  }

  private final case class Cue(startMs: Long, endMs: Long, lines: Seq[String])

  /** Parse a subtitle document; None on any grammar violation. */
  def info(body: String): Option[SubInfo] = {
    if (body == null || body.isEmpty) return None
    val lines = body.split("\r\n|\n", -1)
    if (lines.headOption.exists(_.startsWith("WEBVTT"))) parseVtt(lines)
    else parseSrt(lines)
  }

  private def finish(fmt: String, cues: Seq[Cue], nNotes: Int): Option[SubInfo] =
    if (cues.isEmpty) None
    else {
      val stripped = cues.map(c => c.lines.map(l => Tag.replaceAllIn(l, "")))
      val maxGap =
        if (cues.size < 2) 0L
        else cues.zip(cues.tail).map { case (a, b) =>
          math.max(0L, b.startMs - a.endMs)
        }.max
      Some(SubInfo(
        fmt = fmt,
        nCues = cues.size,
        nNotes = nNotes,
        firstStartMs = cues.head.startMs,
        lastEndMs = cues.last.endMs,
        speechMs = cues.map(c => c.endMs - c.startMs).sum,
        textChars = stripped.map(_.map(_.length.toLong).sum).sum,
        nTagged = cues.count(_.lines.exists(l => Tag.findFirstIn(l).isDefined)),
        maxGapMs = maxGap))
    }

  private def parseSrt(lines: Array[String]): Option[SubInfo] = {
    val cues = Seq.newBuilder[Cue]
    var i = 0
    while (i < lines.length) {
      if (lines(i).trim.isEmpty) i += 1
      else {
        // index line: digits only (the de-facto grammar numbers from 1,
        // but renumbered files exist — require digits, not the value)
        if (!lines(i).trim.forall(_.isDigit) || lines(i).trim.isEmpty)
          return None
        i += 1
        if (i >= lines.length) return None
        val cue = lines(i).trim match {
          case SrtTime(h1, m1, s1, f1, h2, m2, s2, f2) =>
            for {
              a <- ms(h1, m1, s1, f1)
              b <- ms(h2, m2, s2, f2)
              if b >= a
            } yield (a, b)
          case _ => None
        }
        if (cue.isEmpty) return None
        i += 1
        val text = Seq.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          text += lines(i); i += 1
        }
        val t = text.result()
        if (t.isEmpty) return None // a cue with no text lines
        cues += Cue(cue.get._1, cue.get._2, t)
      }
    }
    finish("srt", cues.result(), 0)
  }

  private def parseVtt(lines: Array[String]): Option[SubInfo] = {
    val cues = Seq.newBuilder[Cue]
    var notes = 0
    var i = 1 // header consumed
    // header block may carry metadata lines until the first blank
    while (i < lines.length && lines(i).trim.nonEmpty) i += 1
    while (i < lines.length) {
      if (lines(i).trim.isEmpty) i += 1
      else if (lines(i).startsWith("NOTE")) {
        notes += 1
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
      } else {
        // optional cue identifier: any line NOT containing the arrow
        var timing = lines(i).trim
        if (!timing.contains("-->")) {
          i += 1
          if (i >= lines.length) return None
          timing = lines(i).trim
        }
        val cue = timing match {
          case VttTime(h1, m1, s1, f1, h2, m2, s2, f2) =>
            for {
              a <- ms(h1, m1, s1, f1)
              b <- ms(h2, m2, s2, f2)
              if b >= a
            } yield (a, b)
          case _ => None
        }
        if (cue.isEmpty) return None
        i += 1
        val text = Seq.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          text += lines(i); i += 1
        }
        val t = text.result()
        if (t.isEmpty) return None
        cues += Cue(cue.get._1, cue.get._2, t)
      }
    }
    finish("vtt", cues.result(), notes)
  }

  // ---- fixture builders (canonical form of the accepted subset) ----

  def srtTimestamp(t: Long): String =
    f"${t / 3600000}%02d:${t / 60000 % 60}%02d:${t / 1000 % 60}%02d,${t % 1000}%03d"

  /** VTT timestamp; hours omitted when zero (the optional-hours form). */
  def vttTimestamp(t: Long): String =
    if (t < 3600000) f"${t / 60000 % 60}%02d:${t / 1000 % 60}%02d.${t % 1000}%03d"
    else f"${t / 3600000}%02d:${t / 60000 % 60}%02d:${t / 1000 % 60}%02d.${t % 1000}%03d"

  def srtCue(index: Int, startMs: Long, endMs: Long, lines: Seq[String]): String =
    s"$index\n${srtTimestamp(startMs)} --> ${srtTimestamp(endMs)}\n" +
      lines.mkString("\n") + "\n\n"

  def vttCue(id: Option[String], startMs: Long, endMs: Long,
      settings: Option[String], lines: Seq[String]): String =
    id.map(_ + "\n").getOrElse("") +
      s"${vttTimestamp(startMs)} --> ${vttTimestamp(endMs)}" +
      settings.map(" " + _).getOrElse("") + "\n" +
      lines.mkString("\n") + "\n\n"

  def vttNote(text: String): String = s"NOTE $text\n\n"

  def vttHeader: String = "WEBVTT\n\n"
}
