package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Mutation fuzz over the round-16 parsers: both 7z BCJ2 wire shapes
  * (2-coder libarchive-readable and 4-coder compressor-per-stream),
  * the raw BCJ2 stream decoder, and the ingest router's new
  * zip-member recursion (mixed data zip, nested zips). Same contract
  * as Round14/15FuzzSpec: hostile bytes produce an Either, never an
  * escaped exception. */
class Round16FuzzSpec extends AnyFunSuite {

  private val rounds = 400

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed.toLong
    Array.fill(n) { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte }
  }

  private def x86ish(n: Int, seed: Int): Array[Byte] = {
    val b = lcg(n, seed)
    var i = 0
    var k = seed
    while (i + 6 < n) {
      k = k * 1103515245 + 12345
      (math.abs(k) % 5) match {
        case 0 => b(i) = 0xE8.toByte
        case 1 => b(i) = 0xE9.toByte
        case 2 => b(i) = 0x0F.toByte; b(i + 1) = (0x80 | (k >>> 8) & 0x0F).toByte
        case _ => ()
      }
      i += 5 + math.abs(k) % 9
    }
    b
  }

  private def mutations(seedBlob: Array[Byte], seed: Int)
      : Iterator[Array[Byte]] = {
    var s = seed
    def next(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    Iterator.tabulate(rounds) { _ =>
      val b = seedBlob.clone()
      next() % 4 match {
        case 0 =>
          val n = 1 + next() % 8
          (0 until n).foreach { _ =>
            if (b.length > 0) {
              val at = next() % b.length
              b(at) = (b(at) ^ (1 + next() % 255)).toByte
            }
          }
          b
        case 1 =>
          java.util.Arrays.copyOf(b, next() % (b.length + 1))
        case 2 =>
          b ++ Array.fill[Byte](1 + next() % 64)((next() % 256).toByte)
        case _ =>
          if (b.length < 40) b
          else {
            val len = 4 + next() % 16
            val from = next() % (b.length - len)
            val to = next() % (b.length - len)
            System.arraycopy(b, from, b, to, len)
            b
          }
      }
    }
  }

  private def assertTotal[L, R](name: String, seedBlob: Array[Byte],
      parse: Array[Byte] => Either[L, R], seed: Int): Unit = {
    assert(parse(seedBlob).isRight, s"$name: seed fixture must parse")
    mutations(seedBlob, seed).zipWithIndex.foreach { case (m, i) =>
      try parse(m)
      catch {
        case e: Throwable =>
          fail(s"$name mutation #$i escaped the Either: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }

  test("7z BCJ2 narrow (2-coder) wire shape never escapes the Either") {
    val blob = SevenZip.writeBcj2(Seq(
      "a.exe" -> x86ish(2500, 3), "b.bin" -> lcg(700, 5)))
    assertTotal("bcj2-narrow", blob, SevenZip.parse(_), 1601)
  }

  test("7z BCJ2 wide (4-coder) wire shape never escapes the Either") {
    val blob = SevenZip.writeBcj2(Seq(
      "a.exe" -> x86ish(2500, 7), "b.bin" -> lcg(700, 11)), wide = true)
    assertTotal("bcj2-wide", blob, SevenZip.parse(_), 1602)
  }

  test("raw BCJ2 stream decode never escapes the Either") {
    val data = x86ish(3000, 13)
    val st = Bcj2.encode(data)
    // mutate each stream independently; the decoder must stay total
    var s = 1603
    def next(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    (0 until rounds).foreach { i =>
      def mut(b: Array[Byte]): Array[Byte] = next() % 3 match {
        case 0 if b.nonEmpty =>
          val c = b.clone(); val at = next() % b.length
          c(at) = (c(at) ^ (1 + next() % 255)).toByte; c
        case 1 => java.util.Arrays.copyOf(b, next() % (b.length + 1))
        case _ => b ++ Array.fill[Byte](1 + next() % 16)((next() % 256).toByte)
      }
      val (m, c, j, r) = next() % 4 match {
        case 0 => (mut(st.main), st.call, st.jump, st.rc)
        case 1 => (st.main, mut(st.call), st.jump, st.rc)
        case 2 => (st.main, st.call, mut(st.jump), st.rc)
        case _ => (st.main, st.call, st.jump, mut(st.rc))
      }
      try Bcj2.decode(m, c, j, r, data.length)
      catch {
        case e: Throwable =>
          fail(s"bcj2 mutation #$i escaped: ${e.getClass.getSimpleName}")
      }
    }
  }

  test("zip member recursion never escapes the Either") {
    val inner = ZipArchive.write(Seq(
      ZipArchive.ZipMember("deep.txt", "deep".getBytes("UTF-8"))), _ => false)
    val zip = ZipArchive.write(Seq(
      ZipArchive.ZipMember("notes.txt", lcg(200, 17).map(b =>
        ('a' + math.abs(b % 26)).toByte)),
      ZipArchive.ZipMember("db.sqlite", Sqlite.write(Seq("t" -> Seq("body")))),
      ZipArchive.ZipMember("inner.zip", inner),
      ZipArchive.ZipMember("logs.gz",
        Warc.gzipMember("log line".getBytes("UTF-8")))), _ % 2 == 0)
    assertTotal("zip-members", zip, IngestRouter.route(_), 1604)
  }
}
