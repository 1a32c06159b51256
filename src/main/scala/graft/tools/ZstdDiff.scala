package graft.tools

/** Seeded zstd differential sweep (the brotli/webp fuzz pattern, pure
  * JVM since the reference encoder — zstd-jni — is on the classpath):
  * random content shapes x levels 1..22 x window overrides x optional
  * raw-content dictionaries x long-distance matching, every frame
  * decoded by graft.operators.Zstd and required byte-exact. Extends
  * ZstdSpec's fixed-level interop to the whole parameter space.
  *
  *   tools/runjava.sh graft.tools.ZstdDiff [nCases=300] [seed=1]
  */
object ZstdDiff {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 300
    val seed = if (args.length > 1) args(1).toInt else 1
    val rnd = new scala.util.Random(seed)
    var pass = 0
    var fail = 0

    def content(kind: Int, size: Int): Array[Byte] = kind match {
      case 0 => // dictionary-ish text
        val words = "the of and information time people website public domain however".split(" ")
        val sb = new StringBuilder
        while (sb.length < size) { sb.append(words(rnd.nextInt(words.length))); sb.append(' ') }
        sb.substring(0, size).getBytes("UTF-8")
      case 1 => Array.fill[Byte](size)(rnd.nextInt(256).toByte)
      case 2 => Array.tabulate[Byte](size)(i => ((i * 37) % 256).toByte)
      case 3 =>
        val out = new java.io.ByteArrayOutputStream()
        while (out.size() < size) {
          val b = rnd.nextInt(256).toByte
          (0 until rnd.nextInt(300) + 1).foreach(_ => out.write(b))
        }
        java.util.Arrays.copyOf(out.toByteArray, size)
      case _ =>
        (content(0, size / 2).toSeq ++ content(1, size - size / 2).toSeq).toArray
    }

    (0 until n).foreach { i =>
      val size = rnd.nextInt(6) match {
        case 0 => 0
        case 1 => 1 + rnd.nextInt(10)
        case 2 => rnd.nextInt(500)
        case 3 => 500 + rnd.nextInt(20000)
        case 4 => 20000 + rnd.nextInt(200000)
        case _ => 200000 + rnd.nextInt(800000)
      }
      val data = content(rnd.nextInt(5), size)
      val level = 1 + rnd.nextInt(22)
      val useDict = rnd.nextDouble() < 0.25 && size > 50
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      ctx.setLevel(level)
      ctx.setChecksum(rnd.nextBoolean())
      if (rnd.nextDouble() < 0.3) ctx.setLong(rnd.nextInt(18) + 10)
      val dictBytes =
        if (useDict) content(0, 2000 + rnd.nextInt(3000)) else null
      if (useDict) ctx.loadDict(dictBytes)
      val blob = ctx.compress(data)
      val dict =
        if (useDict)
          Some(graft.operators.Zstd.parseDictionary(dictBytes).toOption.get)
        else None
      graft.operators.Zstd.decode(blob, dict) match {
        case Right(frames)
            if frames.nonEmpty &&
              java.util.Arrays.equals(frames.head.content, data) =>
          pass += 1
        case Right(frames) =>
          fail += 1
          println(s"DIFF case $i: level=$level size=$size dict=$useDict " +
            s"got=${frames.headOption.map(_.content.length)}")
        case Left(r) =>
          fail += 1
          println(s"REJ  case $i: level=$level size=$size dict=$useDict ${r.reason}")
      }
    }
    println(s"$pass/${pass + fail} random zstd-jni frames decode byte-exactly")
    if (fail > 0) sys.exit(1)
  }
}
