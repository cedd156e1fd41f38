package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM USTAR (POSIX.1-1988 tar) pack/unpack — the WebDataset shard
  * container a multimodal training stack actually consumes (a .tar of
  * (name, payload) entries read sequentially at train time). Byte-level
  * like the sibling BMP/WAV/PNG/JPEG codecs: 512-byte headers (name,
  * octal size/mode/mtime, checksum over the header with the checksum
  * field blanked, "ustar\0" magic), data padded to 512, two zero blocks
  * at the end. Deterministic output: fixed mode 0644, uid/gid 0, mtime 0
  * — byte-identical shards from byte-identical inputs on any engine.
  */
object TarCodec {
  private final val Block = 512

  /** Pack (name, data) entries into one ustar archive. Names must be
    * non-empty and fit the classic 100-byte field (shard entry names are
    * generated keys — if one doesn't fit, that's a caller bug, not a
    * truncation opportunity).
    */
  def pack(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    var total = 2 * Block
    val named = entries.map { case (name, data) =>
      val nb = name.getBytes("UTF-8")
      require(nb.nonEmpty && nb.length <= 100,
        s"tar entry name must be 1..100 UTF-8 bytes, got ${nb.length} ('${name.take(40)}')")
      total += Block + ((data.length + Block - 1) / Block) * Block
      (nb, data)
    }
    val out = new Array[Byte](total)
    var pos = 0
    named.foreach { case (nb, data) =>
      writeHeader(out, pos, nb, data.length)
      pos += Block
      System.arraycopy(data, 0, out, pos, data.length)
      pos += ((data.length + Block - 1) / Block) * Block
    }
    out // trailing 2 zero blocks are already zero
  }

  private def writeOctal(out: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    // width-1 octal digits, zero-padded, NUL terminator (the widely-read form)
    var i = width - 2
    var x = v
    out(off + width - 1) = 0
    while (i >= 0) {
      out(off + i) = ('0' + (x & 7L)).toByte
      x >>= 3
      i -= 1
    }
    require(x == 0, s"value $v does not fit $width-char octal field")
  }

  private def writeHeader(out: Array[Byte], off: Int, name: Array[Byte], size: Int): Unit = {
    System.arraycopy(name, 0, out, off, name.length)
    writeOctal(out, off + 100, 8, 420)      // mode 0644
    writeOctal(out, off + 108, 8, 0)        // uid
    writeOctal(out, off + 116, 8, 0)        // gid
    writeOctal(out, off + 124, 12, size.toLong)
    writeOctal(out, off + 136, 12, 0)       // mtime
    java.util.Arrays.fill(out, off + 148, off + 156, ' '.toByte) // chksum spaces
    out(off + 156) = '0'                    // typeflag: regular file
    val magic = Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0') // POSIX "ustar\0" + version "00"
    System.arraycopy(magic, 0, out, off + 257, magic.length)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += out(off + i) & 0xff; i += 1 }
    // checksum: 6 octal digits, NUL, space
    var j = 5
    var s = sum
    while (j >= 0) { out(off + 148 + j) = ('0' + (s & 7L)).toByte; s >>= 3; j -= 1 }
    out(off + 154) = 0
    out(off + 155) = ' '.toByte
  }

  /** Unpack a ustar archive to (name, data) entries. Walks headers until
    * the zero block (or end of input); verifies each header checksum and
    * the "ustar" magic — a corrupt shard FAILS loudly instead of yielding
    * truncated silent garbage.
    */
  def unpack(tar: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var pos = 0
    while (pos + Block <= tar.length && !isZeroBlock(tar, pos)) {
      var stored = 0L
      var sum = 0L
      var i = 0
      while (i < Block) {
        val b = tar(pos + i) & 0xff
        sum += (if (i >= 148 && i < 156) ' '.toInt else b)
        i += 1
      }
      stored = parseOctal(tar, pos + 148, 8)
      require(stored == sum, s"tar header checksum mismatch at offset $pos ($stored != $sum)")
      require(tar(pos + 257) == 'u' && tar(pos + 258) == 's' && tar(pos + 259) == 't' &&
        tar(pos + 260) == 'a' && tar(pos + 261) == 'r',
        s"missing ustar magic at offset $pos")
      var nameLen = 0
      while (nameLen < 100 && tar(pos + nameLen) != 0) nameLen += 1
      val name = new String(tar, pos, nameLen, "UTF-8")
      val size = parseOctal(tar, pos + 124, 12).toInt
      val data = java.util.Arrays.copyOfRange(tar, pos + Block, pos + Block + size)
      out += ((name, data))
      pos += Block + ((size + Block - 1) / Block) * Block
    }
    out.result()
  }

  private def isZeroBlock(a: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < Block) { if (a(off + i) != 0) return false; i += 1 }
    true
  }

  private def parseOctal(a: Array[Byte], off: Int, width: Int): Long = {
    var v = 0L
    var i = 0
    // skip leading spaces, stop at NUL/space
    while (i < width && (a(off + i) == ' '.toByte)) i += 1
    while (i < width && a(off + i) >= '0' && a(off + i) <= '7') {
      v = (v << 3) + (a(off + i) - '0')
      i += 1
    }
    v
  }

  /** Internal-row bridges for the expressions below. */
  private[functions] def packArray(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val entries = Seq.newBuilder[(String, Array[Byte])]
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      entries += ((row.getUTF8String(0).toString, row.getBinary(1)))
      i += 1
    }
    pack(entries.result())
  }

  private[functions] def entriesArray(tar: Array[Byte]): ArrayData = {
    val es = unpack(tar)
    new GenericArrayData(es.map { case (name, data) =>
      InternalRow(UTF8String.fromString(name), data)
    }.toArray[Any])
  }
}

/** `array<struct<name:string, data:binary>>` → one ustar archive (binary).
  * Runs once per SHARD row (bounded entry lists), so the generated code is
  * a single static call — full codegen compatibility without inlining the
  * byte walk.
  */
case class TarPackExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(f1, f2)), _)
      if f1.dataType == StringType && f2.dataType == BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tar_pack expects array<struct<string, binary>>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_tar_pack"

  override def nullSafeEval(input: Any): Any =
    TarCodec.packArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TarCodec.packArray($arr);")

  override protected def withNewChildInternal(newChild: Expression): TarPackExpr =
    copy(child = newChild)
}

/** ustar archive (binary) → `array<struct<name:string, data:binary>>`. */
case class TarEntriesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tar_entries expects binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("name", StringType, nullable = false),
      StructField("data", BinaryType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_tar_entries"

  override def nullSafeEval(input: Any): Any =
    TarCodec.entriesArray(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tar =>
      s"${ev.value} = graft.functions.TarCodec.entriesArray($tar);")

  override protected def withNewChildInternal(newChild: Expression): TarEntriesExpr =
    copy(child = newChild)
}

object Tar {
  def packEntries(entries: Column): Column =
    GraftShim.toColumn(TarPackExpr(GraftShim.toExpression(entries)))
  def entries(tar: Column): Column =
    GraftShim.toColumn(TarEntriesExpr(GraftShim.toExpression(tar)))
}
