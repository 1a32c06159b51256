package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ORC tail census against the REAL orc-core writer on the classpath
  * (the same implementation Spark embeds): compression kinds, stripe
  * directories, type trees, hostile mutations. */
class OrcFooterSpec extends AnyFunSuite {

  private def realOrc(nRows: Int, compress: String,
      stripeEvery: Int = 0): Array[Byte] = {
    import org.apache.orc.{OrcFile, TypeDescription, CompressionKind}
    val f = java.io.File.createTempFile("graft_orc", ".orc")
    f.delete()
    val conf = new org.apache.hadoop.conf.Configuration()
    val schema = TypeDescription.fromString("struct<id:bigint,body:string>")
    val writer = OrcFile.createWriter(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath),
      OrcFile.writerOptions(conf).setSchema(schema)
        .compress(CompressionKind.valueOf(compress))
        .stripeSize(64L * 1024 * 1024))
    val batch = schema.createRowBatch()
    val idCol = batch.cols(0)
      .asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.LongColumnVector]
    val bodyCol = batch.cols(1)
      .asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.BytesColumnVector]
    var written = 0
    while (written < nRows) {
      val r = batch.size
      idCol.vector(r) = written.toLong
      bodyCol.setVal(r, s"orc row $written".getBytes("UTF-8"))
      batch.size += 1
      written += 1
      if (batch.size == batch.getMaxSize ||
        (stripeEvery > 0 && written % stripeEvery == 0)) {
        writer.addRowBatch(batch)
        batch.reset()
        if (stripeEvery > 0 && written % stripeEvery == 0)
          writer.writeIntermediateFooter() // forces a stripe boundary
      }
    }
    if (batch.size > 0) writer.addRowBatch(batch)
    writer.close()
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    f.delete()
    new java.io.File(f.getParentFile, "." + f.getName + ".crc").delete()
    bytes
  }

  test("real orc-core files census exactly across compressions") {
    for {
      compress <- Seq("NONE", "ZLIB", "SNAPPY", "ZSTD", "LZ4", "LZO")
      n <- Seq(0, 5, 1000)
    } {
      val blob = realOrc(n, compress)
      val info = OrcFooter.census(blob).toOption.get
      assert(info.compression == compress.toLowerCase, s"$compress/$n")
      assert(info.nRows == n, s"$compress/$n")
      assert(info.stripeRows.sum == n, s"$compress/$n")
      assert(info.rootFieldNames == Seq("id", "body"), s"$compress/$n")
      assert(info.nTypes == 3, s"$compress/$n") // struct + 2 leaves
      if (n > 0) assert(info.nStripes >= 1)
    }
  }

  test("multi-stripe files sum their stripe directory") {
    val blob = realOrc(3000, "ZLIB", stripeEvery = 1024)
    val info = OrcFooter.census(blob).toOption.get
    assert(info.nRows == 3000)
    assert(info.nStripes >= 2)
    assert(info.stripeRows.sum == 3000)
  }

  test("hostile tails reject with named reasons") {
    val good = realOrc(50, "ZLIB")
    assert(OrcFooter.census("definitely not orc".getBytes) match {
      case Left(r) => r == "not_orc" || r == "truncated_orc" ||
        r.startsWith("proto_")
      case _ => false
    })
    assert(OrcFooter.census(java.util.Arrays.copyOf(good, 10)).isLeft)
    // postscript length lying past the file
    val lie = good.clone()
    lie(lie.length - 1) = 0xFF.toByte
    assert(OrcFooter.census(lie).isLeft)
    // flip single bytes across the tail (footer + postscript region):
    // corruptions must land in NAMED fates, never escape; at least
    // some must reject (a flip inside a string can be benign)
    val psLen = good(good.length - 1) & 0xff
    var named = 0
    for (k <- 1 to 60) {
      val m = good.clone()
      val at = good.length - psLen - 2 - k * 3
      m(at) = (m(at) ^ 0x41).toByte
      OrcFooter.census(m) match {
        case Left(_) => named += 1
        case Right(_) => ()
      }
    }
    assert(named > 0)
  }
}
