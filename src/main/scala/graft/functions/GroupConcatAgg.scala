package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MySQL `GROUP_CONCAT(expr ORDER BY keys SEPARATOR sep)` as a native
  * Catalyst aggregate (SURVEY §2.10's optional custom) — the byte-faithful
  * path: enforces `group_concat_max_len` truncation exactly like the
  * reference's `set session group_concat_max_len=100000`
  * (flat_obs_v1.0.sql:25), including MySQL's behavior of truncating the
  * JOINED string, not dropping whole entries.
  *
  * The pure-Catalyst composition [[MysqlFunctions.groupConcat]]
  * (collect_list + array_sort + array_join) remains the default — it
  * whole-stage-codegens and needs no custom serialization. This aggregate
  * exists for (a) byte-fidelity truncation, (b) SQL surface parity
  * (`SELECT group_concat(v, k) …` after [[SqlFunctions.register]]), and
  * (c) as the UDAF-tier reference implementation.
  *
  * Buffer = (sortKey row, value) pairs; partial aggregation merges buffers
  * (map-side combine applies); ordering happens once at eval.
  *
  * MEMORY BOUND: truncation keeps the sorted PREFIX, so a row whose start
  * offset in the joined sorted sequence already exceeds `maxLen` bytes can
  * never surface — later inserts only push it further right (and for
  * `distinct`, a buffer-internal dedup-by-value first keeps each value's
  * minimal sort position, which is all the final dedup consults). The
  * buffer therefore compacts itself once it crosses a self-tuning
  * threshold: sort, dedup if distinct, drop everything past the first
  * `maxLen` bytes. A one-key-millions-of-rows group holds O(maxLen) bytes
  * of values in executor memory instead of the whole group, and the eval
  * result is bit-identical to the unbounded computation (spec-asserted).
  */
case class GroupConcatAgg(
    value: Expression,
    sortKey: Expression,
    separator: String = " ## ",
    maxLen: Int = 100000,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GroupConcatAgg.ConcatBuf] {

  import GroupConcatAgg.ConcatBuf

  override def children: Seq[Expression] = Seq(value, sortKey)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  private lazy val keyType = sortKey.dataType
  private lazy val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
  private lazy val keyProjection = UnsafeProjection.create(Seq(sortKey))
  private lazy val sepBytes = UTF8String.fromString(separator).numBytes

  override def createAggregationBuffer(): ConcatBuf = new ConcatBuf

  override def update(buffer: ConcatBuf, input: InternalRow): ConcatBuf = {
    val v = value.eval(input)
    if (v != null) {
      // copy: projection output and eval results alias reused buffers
      val keyRow = keyProjection(input).copy()
      buffer.rows += ((keyRow, v.asInstanceOf[UTF8String].clone()))
      maybeCompact(buffer)
    }
    buffer
  }

  override def merge(buffer: ConcatBuf, other: ConcatBuf): ConcatBuf = {
    buffer.rows ++= other.rows
    maybeCompact(buffer)
    buffer
  }

  private def sortRows(rows: mutable.ArrayBuffer[(InternalRow, UTF8String)]) =
    rows.sortWith { case ((ka, va), (kb, vb)) =>
      val c = keyOrdering.compare(ka.get(0, keyType), kb.get(0, keyType))
      if (c != 0) c < 0 else va.compareTo(vb) < 0 // deterministic tie-break
    }

  /** For `distinct`, only each value's MINIMAL sort position matters
    * downstream; on a sorted buffer that is its first occurrence. */
  private def dedupSorted(sorted: mutable.ArrayBuffer[(InternalRow, UTF8String)]) = {
    val seen = mutable.HashSet.empty[UTF8String]
    sorted.filter { case (_, v) => seen.add(v) }
  }

  /** Drop rows that can never reach the first `maxLen` output bytes. */
  private def maybeCompact(buffer: ConcatBuf): Unit = {
    if (buffer.rows.length < buffer.nextCompactAt) return
    val sorted = sortRows(buffer.rows)
    val pruned = if (distinct) dedupSorted(sorted) else sorted
    val kept = mutable.ArrayBuffer.empty[(InternalRow, UTF8String)]
    var cum = 0L
    val it = pruned.iterator
    while (it.hasNext && cum <= maxLen) {
      val e = it.next()
      kept += e
      cum += e._2.numBytes + sepBytes
    }
    buffer.rows.clear()
    buffer.rows ++= kept
    // doubling keeps compaction amortized-linear even when values are so
    // small (or the separator empty) that little can be dropped
    buffer.nextCompactAt =
      math.max(GroupConcatAgg.MinCompactAt, buffer.rows.length * 2)
  }

  override def eval(buffer: ConcatBuf): Any = {
    if (buffer.rows.isEmpty) return null // MySQL: NULL when no non-null values
    val values = sortRows(buffer.rows).map(_._2.toString)
    val deduped = if (distinct) values.distinct else values
    val joined = UTF8String.fromString(deduped.mkString(separator))
    // MySQL's group_concat_max_len counts BYTES, not UTF-16 code units.
    // Truncate on UTF-8 bytes, backing off to the start of any code point
    // that straddles the limit so the result is always valid UTF-8.
    if (joined.numBytes <= maxLen) joined
    else {
      val bytes = joined.getBytes
      var end = maxLen
      while (end > 0 && (bytes(end) & 0xc0) == 0x80) end -= 1
      UTF8String.fromBytes(bytes, 0, end)
    }
  }

  override def serialize(buffer: ConcatBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.rows.size)
    buffer.rows.foreach { case (k, v) =>
      val kBytes = k.asInstanceOf[UnsafeRow].getBytes
      out.writeInt(kBytes.length); out.write(kBytes)
      val vBytes = v.getBytes
      out.writeInt(vBytes.length); out.write(vBytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ConcatBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ConcatBuf
    (0 until n).foreach { _ =>
      val kLen = in.readInt(); val kBytes = new Array[Byte](kLen); in.readFully(kBytes)
      val row = new UnsafeRow(1)
      row.pointTo(kBytes, kLen)
      val vLen = in.readInt(); val vBytes = new Array[Byte](vLen); in.readFully(vBytes)
      buf.rows += ((row, UTF8String.fromBytes(vBytes)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GroupConcatAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GroupConcatAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupConcatAgg =
    copy(value = newChildren(0), sortKey = newChildren(1))
  override def prettyName: String = "group_concat"
}

object GroupConcatAgg {
  import org.apache.spark.sql.GraftColumnBridge

  /** Aggregation state: the (key, value) rows plus the self-tuning
    * compaction trigger (serialized state carries only the rows — a
    * deserialized buffer re-tunes from the default). */
  final class ConcatBuf {
    val rows = mutable.ArrayBuffer.empty[(InternalRow, UTF8String)]
    var nextCompactAt: Int = MinCompactAt
  }

  /** Below this row count the buffer never bothers compacting — small
    * groups (the overwhelmingly common case) pay zero overhead. */
  val MinCompactAt = 8192

  /** Column-API surface: `group_concat(value, sortKeys…)` with MySQL
    * truncation semantics. (Spark 4: Column <-> Expression bridging goes
    * through the GraftColumnBridge shim.) */
  def apply(value: Column, sortKeys: Seq[Column], sep: String, maxLen: Int,
      distinct: Boolean): Column = {
    val keyExpr = GraftColumnBridge.expression(
      org.apache.spark.sql.functions.struct(sortKeys: _*))
    GraftColumnBridge.column(
      GroupConcatAgg(GraftColumnBridge.expression(value.cast("string")), keyExpr,
        sep, maxLen, distinct).toAggregateExpression())
  }
}
