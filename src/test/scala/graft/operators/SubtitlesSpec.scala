package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class SubtitlesSpec extends AnyFunSuite {

  test("SRT roundtrip: timings, text volume, tag strip, gaps") {
    val body =
      Subtitles.srtCue(1, 1000, 2500, Seq("hello there")) +
        Subtitles.srtCue(2, 4000, 6200, Seq("<i>styled</i>", "second line")) +
        Subtitles.srtCue(3, 6200, 9000, Seq("end"))
    val i = Subtitles.info(body).get
    assert(i.fmt == "srt" && i.nCues == 3 && i.nNotes == 0)
    assert(i.firstStartMs == 1000 && i.lastEndMs == 9000)
    assert(i.speechMs == 1500 + 2200 + 2800)
    // "hello there"(11) + "styled"(6) + "second line"(11) + "end"(3)
    assert(i.textChars == 31)
    assert(i.nTagged == 1)
    assert(i.maxGapMs == 1500) // 4000-2500; the 6200->6200 seam is 0
  }

  test("SRT hour-scale timestamps parse exactly") {
    val t = 2 * 3600000L + 34 * 60000L + 56000L + 789
    val i = Subtitles.info(Subtitles.srtCue(1, t, t + 1, Seq("x"))).get
    assert(i.firstStartMs == t && i.lastEndMs == t + 1)
    assert(Subtitles.srtTimestamp(t) == "02:34:56,789")
  }

  test("WebVTT: header, NOTE blocks, cue ids, settings, optional hours") {
    val body = Subtitles.vttHeader +
      Subtitles.vttNote("machine generated") +
      Subtitles.vttCue(None, 500, 1500, Some("align:start"), Seq("one")) +
      Subtitles.vttCue(Some("c1"), 3000, 3700000, None, Seq("<b>two</b>"))
    val i = Subtitles.info(body).get
    assert(i.fmt == "vtt" && i.nCues == 2 && i.nNotes == 1)
    assert(i.firstStartMs == 500 && i.lastEndMs == 3700000)
    assert(i.nTagged == 1 && i.textChars == 6)
    // canonical forms: short before the hour, long after
    assert(Subtitles.vttTimestamp(500) == "00:00.500")
    assert(Subtitles.vttTimestamp(3700000) == "01:01:40.000")
  }

  test("CRLF line endings are tolerated in both grammars") {
    val srt = Subtitles.srtCue(1, 0, 900, Seq("a")).replace("\n", "\r\n")
    assert(Subtitles.info(srt).exists(_.nCues == 1))
    val vtt = (Subtitles.vttHeader +
      Subtitles.vttCue(None, 0, 900, None, Seq("a"))).replace("\n", "\r\n")
    assert(Subtitles.info(vtt).exists(i => i.fmt == "vtt" && i.nCues == 1))
  }

  test("hostile streams quarantine, never guess") {
    def srt1 = Subtitles.srtCue(1, 1000, 2000, Seq("ok"))
    assert(Subtitles.info(null).isEmpty)
    assert(Subtitles.info("").isEmpty)
    assert(Subtitles.info("just prose, no subtitle structure").isEmpty)
    // reversed interval
    assert(Subtitles.info(
      "1\n00:00:02,000 --> 00:00:01,000\nx\n\n").isEmpty)
    // minutes / seconds out of range
    assert(Subtitles.info(
      "1\n00:61:00,000 --> 00:61:01,000\nx\n\n").isEmpty)
    assert(Subtitles.info(
      "1\n00:00:61,000 --> 00:00:62,000\nx\n\n").isEmpty)
    // malformed arrow / millis separator
    assert(Subtitles.info(
      "1\n00:00:01,000 -> 00:00:02,000\nx\n\n").isEmpty)
    assert(Subtitles.info(
      "1\n00:00:01.000 --> 00:00:02.000\nx\n\n").isEmpty) // '.' is VTT-only
    // non-numeric index line
    assert(Subtitles.info(
      "one\n00:00:01,000 --> 00:00:02,000\nx\n\n").isEmpty)
    // cue with no text
    assert(Subtitles.info("1\n00:00:01,000 --> 00:00:02,000\n\n").isEmpty)
    // truncated mid-timing
    assert(Subtitles.info("1\n00:00:01,0").isEmpty)
    // a malformed SECOND cue poisons the document (no partial output)
    assert(Subtitles.info(srt1 + "2\nbroken\nx\n\n").isEmpty)
    // VTT: comma millis rejected, bare timing without text rejected
    assert(Subtitles.info(Subtitles.vttHeader +
      "00:01,000 --> 00:02,000\nx\n\n").isEmpty)
    assert(Subtitles.info(Subtitles.vttHeader +
      "00:01.000 --> 00:02.000\n\n").isEmpty)
    // an all-NOTE VTT has no cues -> reject
    assert(Subtitles.info(Subtitles.vttHeader +
      Subtitles.vttNote("nothing else")).isEmpty)
  }

  test("max gap over non-monotonic cue starts never goes negative") {
    // overlapping cues (legal in both formats): gap clamps at 0
    val body =
      Subtitles.srtCue(1, 0, 5000, Seq("a")) +
        Subtitles.srtCue(2, 3000, 6000, Seq("b"))
    assert(Subtitles.info(body).get.maxGapMs == 0)
  }
}
