package graft.tools

/** Seeded LZ4-frame + snappy-framed differential sweep (the ZstdDiff
  * pattern, pure JVM — the reference codecs lz4-java and snappy-java
  * are on the classpath): random content shapes × sizes × LZ4 block
  * sizes/flags, every stream decoded by graft.operators.Lz4 /
  * graft.operators.Snappy and required byte-exact.
  *
  *   tools/runjava.sh graft.tools.Lz4SnappyDiff [nCases=300] [seed=1]
  */
object Lz4SnappyDiff {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 300
    val seed = if (args.length > 1) args(1).toInt else 1
    val rnd = new scala.util.Random(seed)
    var pass = 0
    var fail = 0

    def content(kind: Int, size: Int): Array[Byte] = kind match {
      case 0 =>
        val words = "the of and information time people website public".split(" ")
        val sb = new StringBuilder
        while (sb.length < size) { sb.append(words(rnd.nextInt(words.length))); sb.append(' ') }
        sb.substring(0, size).getBytes("UTF-8")
      case 1 => Array.fill[Byte](size)(rnd.nextInt(256).toByte)
      case 2 => Array.tabulate[Byte](size)(i => ((i * 37) % 256).toByte)
      case 3 =>
        val out = new java.io.ByteArrayOutputStream()
        while (out.size() < size) {
          val b = rnd.nextInt(256).toByte
          (0 until rnd.nextInt(900) + 1).foreach(_ => out.write(b))
        }
        java.util.Arrays.copyOf(out.toByteArray, size)
      case _ =>
        (content(0, size / 2).toSeq ++ content(1, size - size / 2).toSeq).toArray
    }

    (0 until n).foreach { i =>
      val size = rnd.nextInt(6) match {
        case 0 => 0
        case 1 => 1 + rnd.nextInt(10)
        case 2 => rnd.nextInt(2000)
        case 3 => 2000 + rnd.nextInt(60000)
        case 4 => 60000 + rnd.nextInt(300000)
        case _ => 300000 + rnd.nextInt(900000)
      }
      val data = content(rnd.nextInt(5), size)
      if (i % 2 == 0) {
        // LZ4 frame via lz4-java
        import net.jpountz.lz4.LZ4FrameOutputStream
        import net.jpountz.lz4.LZ4FrameOutputStream.{BLOCKSIZE, FLG}
        val bs = rnd.nextInt(4) match {
          case 0 => BLOCKSIZE.SIZE_64KB
          case 1 => BLOCKSIZE.SIZE_256KB
          case 2 => BLOCKSIZE.SIZE_1MB
          case _ => BLOCKSIZE.SIZE_4MB
        }
        val flags =
          if (rnd.nextBoolean())
            Array(FLG.Bits.BLOCK_INDEPENDENCE, FLG.Bits.CONTENT_CHECKSUM)
          else Array(FLG.Bits.BLOCK_INDEPENDENCE)
        val bos = new java.io.ByteArrayOutputStream()
        val z = new LZ4FrameOutputStream(bos, bs, data.length.toLong, flags: _*)
        z.write(data); z.close()
        graft.operators.Lz4.decode(bos.toByteArray, maxOut = 1 << 27) match {
          case Right(got) if got.sameElements(data) => pass += 1
          case Right(_) => println(s"FAIL lz4 case $i: bytes differ"); fail += 1
          case Left(r) =>
            println(s"FAIL lz4 case $i (${data.length}b $bs): ${r.reason}")
            fail += 1
        }
      } else {
        // snappy framed via snappy-java
        val bos = new java.io.ByteArrayOutputStream()
        val z = new org.xerial.snappy.SnappyFramedOutputStream(bos)
        z.write(data); z.close()
        graft.operators.Snappy.decode(bos.toByteArray, maxOut = 1 << 27) match {
          case Right(got) if got.sameElements(data) => pass += 1
          case Right(_) =>
            println(s"FAIL snappy case $i: bytes differ"); fail += 1
          case Left(r) =>
            println(s"FAIL snappy case $i (${data.length}b): ${r.reason}")
            fail += 1
        }
      }
    }
    println(s"$pass/${pass + fail} reference-encoded LZ4/snappy streams byte-exact under graft")
    if (fail > 0) sys.exit(1)
  }
}
