package graft.operators

/** Avro Object Container File census — the other data-lake format
  * (Kafka archives, export dumps) a corpus carries beside parquet.
  * Grammar per the public Avro 1.x spec: magic `Obj\x01`, a file
  * metadata MAP (avro map encoding: zigzag-varint block counts, a
  * negative count prefixes a byte size; `avro.schema` JSON and
  * `avro.codec`), a 16-byte sync marker, then data blocks of
  * (record count, byte size, payload, sync) — so RECORD COUNTS are
  * container-level truth and the census needs no payload decode.
  * Payload decode is out of scope and rejects by name
  * (`<codec>_payload_not_decoded` never appears — the census simply
  * does not open payloads; a curation pass routes by schema).
  *
  * Reject-don't-guess: bad magic, a metadata map or block overrunning
  * the file, a data block whose trailing sync does not match the
  * header's (`sync_mismatch` — the classic torn-file signature),
  * negative counts, or a bomb-sized declaration quarantine by name.
  * Fixtures come from the REAL avro-java on the classpath.
  */
object Avro {

  final case class Info(
      codec: String, // "null" when absent
      schemaLen: Int,
      schemaMd5: String,
      nMetaKeys: Int,
      nBlocks: Long,
      nRecords: Long,
      blockBytes: Long)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private final class Scan(val b: Array[Byte]) {
    var i = 0
    def u8(): Int = {
      if (i >= b.length) bail("truncated_avro")
      val v = b(i) & 0xff; i += 1; v
    }
    def zigzag(): Long = {
      var v = 0L
      var shift = 0
      while (shift < 64) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return (v >>> 1) ^ -(v & 1)
        shift += 7
      }
      bail("bad_varint")
    }
    def bytes(n: Long): Array[Byte] = {
      if (n < 0 || n > Int.MaxValue || i + n > b.length)
        bail("truncated_avro")
      val out = java.util.Arrays.copyOfRange(b, i, i + n.toInt)
      i += n.toInt
      out
    }
    def skip(n: Long): Unit = {
      if (n < 0 || i + n > b.length) bail("truncated_avro")
      i += n.toInt
    }
  }

  def census(blob: Array[Byte], maxBlocks: Int = 1 << 20)
      : Either[String, Info] =
    try {
      if (blob == null || blob.length < 20) bail("truncated_avro")
      if (blob(0) != 'O' || blob(1) != 'b' || blob(2) != 'j' ||
        blob(3) != 1) bail("not_avro")
      val s = new Scan(blob)
      s.i = 4

      // file metadata map
      var codec = "null"
      var schema: Array[Byte] = null
      var nKeys = 0
      var blockCount = s.zigzag()
      while (blockCount != 0) {
        val n =
          if (blockCount < 0) { s.zigzag(); -blockCount } // size-prefixed
          else blockCount
        if (n > (1 << 16)) bail("metadata_too_large")
        var k = 0L
        while (k < n) {
          val key = new String(s.bytes(s.zigzag()), "UTF-8")
          val value = s.bytes(s.zigzag())
          nKeys += 1
          if (key == "avro.codec") codec = new String(value, "UTF-8")
          if (key == "avro.schema") schema = value
          k += 1
        }
        blockCount = s.zigzag()
      }
      if (schema == null) bail("missing_schema")
      val sync = s.bytes(16)

      var nBlocks = 0L
      var nRecords = 0L
      var blockBytes = 0L
      while (s.i < blob.length) {
        val count = s.zigzag()
        if (count < 0) bail("negative_block_count")
        val size = s.zigzag()
        if (size < 0) bail("negative_block_size")
        s.skip(size)
        val trailer = s.bytes(16)
        if (!java.util.Arrays.equals(trailer, sync)) bail("sync_mismatch")
        nBlocks += 1
        if (nBlocks > maxBlocks) bail("avro_bomb")
        nRecords += count
        blockBytes += size
      }
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(schema).map("%02x".format(_)).mkString
      Right(Info(codec, schema.length, md5, nKeys, nBlocks, nRecords,
        blockBytes))
    } catch { case e: Bail => Left(e.reason) }
}
