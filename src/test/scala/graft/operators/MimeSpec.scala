package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class MimeSpec extends AnyFunSuite {

  private def simple(body: String, subject: String = "Hi"): String =
    s"""From: Ann Example <ann@example.org>
       |To: bob@example.org,
       |	carol@example.org
       |Subject: $subject
       |Date: Tue, 02 Apr 2024 12:30:00 +0000
       |Message-ID: <m1@example.org>
       |
       |$body""".stripMargin

  test("simple message: headers, folded To, angle-addr, text chars") {
    val i = Mime.info(simple("hello mail\n")).get
    assert(i.fromAddr == "ann@example.org")
    assert(i.subject == "Hi")
    assert(i.messageId == "<m1@example.org>")
    assert(i.date == "Tue, 02 Apr 2024 12:30:00 +0000")
    assert(i.nLeaves == 1 && i.maxDepth == 1)
    assert(i.textChars == "hello mail".length)
    assert(i.nAttachments == 0 && i.attachmentBytes == 0)
  }

  test("RFC 2047 subject: B and Q words, adjacent-word whitespace") {
    val s = Mime.bWord("Héllo") + " " + Mime.qWord("wörld x")
    val i = Mime.info(simple("b\n", subject = s)).get
    // whitespace between two encoded words is transparent
    assert(i.subject == "Héllowörld x")
    // truly-unknown charset: word left as-is, not guessed
    val j = Mime.info(simple("b\n", subject = "=?X-MYSTERY?B?AAAA?= tail")).get
    assert(j.subject == "=?X-MYSTERY?B?AAAA?= tail")
  }

  test("RFC 2047 non-Latin charsets decode strictly via the sniffer table") {
    for ((label, text) <- Seq(("Shift_JIS", "こんにちは 報告"),
        ("GBK", "中文测试"), ("euc-kr", "한국어 제목"), ("Big5", "中文標題"),
        ("KOI8-R", "привет"), ("windows-1251", "тема письма"))) {
      val i = Mime.info(simple("b\n", subject = Mime.bWordIn(text, label)))
      assert(i.isDefined, label)
      assert(i.get.subject == text, label)
    }
    // RFC 2231 language suffix on the label is stripped before lookup
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "hello".getBytes("US-ASCII"))
    assert(Mime.info(simple("b\n", subject = s"=?utf-8*en?B?$b64?="))
      .get.subject == "hello")
  }

  test("RFC 2047 wrong declared label quarantines instead of mojibake") {
    // bytes no Shift_JIS stream can contain (0xFF; truncated lead at
    // end): the strict decoder rejects, so the MESSAGE quarantines
    for (bad <- Seq(Array(0xff.toByte, 0x41.toByte),
        Array(0x82.toByte) /* lone lead byte */ )) {
      val lying = "=?Shift_JIS?B?" +
        java.util.Base64.getEncoder.encodeToString(bad) + "?="
      assert(Mime.info(simple("b\n", subject = lying)).isEmpty,
        bad.map(b => f"$b%02x").mkString)
    }
  }

  test("multipart: text + html + base64 attachment, nested depth") {
    val att = Array.tabulate(97)(_.toByte)
    val msg =
      s"""From: a@example.org
         |Subject: m
         |Message-ID: <m2@example.org>
         |Content-Type: multipart/mixed; boundary="outer"
         |
         |preamble is transparent
         |--outer
         |Content-Type: multipart/alternative; boundary=inner
         |
         |--inner
         |Content-Type: text/plain
         |
         |plain part
         |--inner
         |Content-Type: text/html
         |
         |<p>html part</p>
         |--inner--
         |--outer
         |Content-Type: application/octet-stream
         |Content-Disposition: attachment; filename="a.bin"
         |Content-Transfer-Encoding: base64
         |
         |${Mime.base64Body(att)}
         |--outer--
         |epilogue""".stripMargin
    val i = Mime.info(msg).get
    assert(i.nLeaves == 3 && i.maxDepth == 3)
    assert(i.textChars == "plain part".length)
    assert(i.htmlChars == "<p>html part</p>".length)
    assert(i.nAttachments == 1 && i.attachmentBytes == 97)
  }

  test("quoted-printable body: =XX and soft line breaks") {
    val msg =
      """From: a@example.org
        |Message-ID: <m3@example.org>
        |Content-Transfer-Encoding: quoted-printable
        |
        |a=3Db and a long line soft=
        | wrapped""".stripMargin
    val i = Mime.info(msg).get
    assert(i.textChars == "a=b and a long line soft wrapped".length)
  }

  test("splitMbox: envelope lines split, mboxrd >From unquoted") {
    val mbox =
      """From ann@example.org Tue Apr  2 12:30:00 2024
        |From: a@example.org
        |Message-ID: <m4@example.org>
        |
        |>From here on
        |From bob@example.org Tue Apr  2 12:31:00 2024
        |From: b@example.org
        |Message-ID: <m5@example.org>
        |
        |second""".stripMargin
    val msgs = Mime.splitMbox(mbox)
    assert(msgs.size == 2)
    val i0 = Mime.info(msgs(0)).get
    assert(i0.textChars == "From here on".length) // unquoted
    assert(Mime.info(msgs(1)).get.fromAddr == "b@example.org")
  }

  test("hostile streams quarantine, never guess") {
    // no header/body separator
    assert(Mime.info("From: a@example.org\nSubject: x").isEmpty)
    // multipart without a boundary parameter
    assert(Mime.info(
      "From: a@x\nMessage-ID: <q>\nContent-Type: multipart/mixed\n\nbody").isEmpty)
    // unterminated multipart (no close delimiter)
    assert(Mime.info(
      "From: a@x\nMessage-ID: <q>\nContent-Type: multipart/mixed; boundary=b\n\n--b\nContent-Type: text/plain\n\nx\n").isEmpty)
    // bogus base64
    assert(Mime.info(
      "From: a@x\nMessage-ID: <q>\nContent-Transfer-Encoding: base64\n\n!!!not base64!!!").isEmpty)
    // invalid quoted-printable escape
    assert(Mime.info(
      "From: a@x\nMessage-ID: <q>\nContent-Transfer-Encoding: quoted-printable\n\nbad =ZZ escape").isEmpty)
    // neither From nor Message-ID: not mail
    assert(Mime.info("X-Other: y\n\nbody").isEmpty)
    // malformed encoded-word payload in subject
    assert(Mime.info(simple("b\n", subject = "=?UTF-8?B?###?=")).isEmpty)
  }

  test("nesting beyond depth 3 quarantines") {
    val msg =
      """From: a@x
        |Message-ID: <d>
        |Content-Type: multipart/mixed; boundary=l1
        |
        |--l1
        |Content-Type: multipart/mixed; boundary=l2
        |
        |--l2
        |Content-Type: multipart/mixed; boundary=l3
        |
        |--l3
        |Content-Type: text/plain
        |
        |deep
        |--l3--
        |--l2--
        |--l1--""".stripMargin
    assert(Mime.info(msg).isEmpty) // leaf would sit at depth 4
  }
}
