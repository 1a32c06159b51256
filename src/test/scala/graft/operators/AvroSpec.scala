package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Avro container census against the REAL avro-java writer on the
  * classpath: codecs null/deflate/snappy, explicit sync() block
  * boundaries, record counts from container truth, hostile
  * mutations. */
class AvroSpec extends AnyFunSuite {

  private val schemaJson =
    """{"type":"record","name":"doc","fields":[
      |{"name":"body","type":"string"},{"name":"n","type":"long"}]}"""
      .stripMargin.replace("\n", "")

  private def realAvro(nRecords: Int, codec: String,
      syncEvery: Int = 2): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val writer = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    codec match {
      case "null" => ()
      case "deflate" => writer.setCodec(
        org.apache.avro.file.CodecFactory.deflateCodec(6))
      case "snappy" => writer.setCodec(
        org.apache.avro.file.CodecFactory.snappyCodec())
    }
    val bos = new java.io.ByteArrayOutputStream()
    writer.create(schema, bos)
    (0 until nRecords).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("body", s"record body $i " + ("pad " * (i % 5)))
      rec.put("n", java.lang.Long.valueOf(i.toLong))
      writer.append(rec)
      if (syncEvery > 0 && (i + 1) % syncEvery == 0) writer.sync()
    }
    writer.close()
    bos.toByteArray
  }

  test("real avro-java containers census exactly across codecs") {
    for {
      codec <- Seq("null", "deflate", "snappy")
      n <- Seq(0, 1, 7, 40)
    } {
      val blob = realAvro(n, codec)
      val info = Avro.census(blob).toOption.get
      assert(info.codec == codec, s"$codec/$n")
      assert(info.nRecords == n, s"$codec/$n")
      if (n > 0) assert(info.nBlocks == (n + 1) / 2, s"$codec/$n blocks")
      assert(info.schemaMd5.length == 32)
      // avro-java omits avro.codec for the null codec
      assert(info.nMetaKeys >= (if (codec == "null") 1 else 2))
      // the stored schema is avro-java's canonical form of ours
      assert(info.schemaLen > 50)
    }
  }

  test("hostile containers reject with named reasons") {
    val good = realAvro(10, "deflate")
    assert(Avro.census("NotAvroAtAll0000000000".getBytes) ==
      Left("not_avro"))
    assert(Avro.census(java.util.Arrays.copyOf(good, good.length - 7)) ==
      Left("truncated_avro"))
    // flip a byte in the LAST sync marker: torn-file signature
    val torn = good.clone()
    torn(torn.length - 3) = (torn(torn.length - 3) ^ 0x41).toByte
    assert(Avro.census(torn) == Left("sync_mismatch"))
    // a block size lying past EOF
    val lie = java.util.Arrays.copyOf(good, good.length - 20)
    assert(Avro.census(lie) match {
      case Left(r) => r == "truncated_avro" || r == "sync_mismatch"
      case _ => false
    })
  }
}
