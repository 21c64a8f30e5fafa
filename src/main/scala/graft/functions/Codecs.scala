package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Per-column time-series codecs as native Catalyst expressions — the
  * Spark rendering of the reference's storage codecs
  * (`CODEC(DoubleDelta)` on timestamps, `CODEC(Gorilla)` on prices,
  * app/clickhouse_schema.py:128-138). In a ClickHouse table the codec
  * is a storage-engine property; in the Spark engine the parquet
  * encoder already delta/dictionary-encodes pages, so the codec's home
  * is the SERIALIZED-STATE path: a per-key candle series packed into
  * ONE compact binary cell (the [[graft.operators.SketchStore]]
  * layout, generalized from HLL states to whole series) that any
  * parquet store can hold and any reader can unpack without touching
  * row-per-bucket storage.
  *
  * Formats (original encodings of the published ideas — DoubleDelta
  * from the ClickHouse codec family, XOR-window compression from the
  * Gorilla paper, Pelkonen et al., VLDB 2015 §4.1 — not byte-compatible
  * clones of either):
  *
  * - `dd_encode(array<long>) -> binary`: varint count, then zigzag
  *   varints of (v0, Δ1, ΔΔ2 … ΔΔn−1). A regular epoch grid (constant
  *   stride) costs ~1 byte per value after the header — 8× under raw.
  * - `gorilla_encode(array<double>) -> binary`: varint count, then a
  *   bit stream: v0 raw 64 bits; each next value XORs with its
  *   predecessor — '0' if identical, '10' + meaningful bits reusing
  *   the previous leading/length window when it still fits, '11' +
  *   5-bit leading-zero count + 6-bit (length−1) + meaningful bits
  *   otherwise. Bit-exact for every double including NaN/±0.
  * - `t64_encode(array<long>) -> binary`: crop-and-transpose blocks
  *   (the reference's third codec, on count-like columns) — see the
  *   T64 section below for the layout.
  *
  * Every decode is an exact inverse (`dd_decode`, `gorilla_decode`,
  * `t64_decode`); round-trip identity is enforced three ways: the
  * CodecsSpec property sweep, a golden-bytes pin, and the
  * `q_codec_roundtrip` oracle row (the engine publishes the equality
  * VERDICT as a column, so a broken codec flips a hash-checked
  * boolean).
  *
  * All six are codegen expressions calling row-local kernels (the
  * [[SimHash64]] discipline) — no UDF, no CodegenFallback, and the
  * encode of a whole series is one row-local call on an
  * already-gathered array (the per-key `collect_list` the serialized
  * state store performs anyway).
  */
object Codecs {

  // ---- varint / zigzag -------------------------------------------------

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private final class ByteWriter {
    private var buf = new Array[Byte](64)
    private var n = 0
    def ensure(k: Int): Unit =
      if (n + k > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, n + k))
      }
    def writeVarLong(value: Long): Unit = {
      var v = value
      ensure(10)
      while ((v & ~0x7fL) != 0L) {
        buf(n) = ((v & 0x7f) | 0x80).toByte; n += 1; v >>>= 7
      }
      buf(n) = v.toByte; n += 1
    }
    def writeRawByte(b: Int): Unit = { ensure(1); buf(n) = b.toByte; n += 1 }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
    def size: Int = n
  }

  private final class ByteReader(bytes: Array[Byte]) {
    private var p = 0
    def readVarLong(): Long = {
      var shift = 0
      var out = 0L
      var b = 0
      do {
        b = bytes(p) & 0xff; p += 1
        out |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      out
    }
    def readRawByte(): Int = { val b = bytes(p) & 0xff; p += 1; b }
    def pos: Int = p
  }

  // ---- DoubleDelta (longs) --------------------------------------------

  def ddEncode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val w = new ByteWriter
    w.writeVarLong(n.toLong)
    if (n > 0) {
      val v0 = elemLong(arr, 0)
      w.writeVarLong(zigzag(v0))
      if (n > 1) {
        var prev = v0
        var prevDelta = 0L
        var i = 1
        while (i < n) {
          val v = elemLong(arr, i)
          val d = v - prev
          if (i == 1) w.writeVarLong(zigzag(d))
          else w.writeVarLong(zigzag(d - prevDelta))
          prev = v
          prevDelta = d
          i += 1
        }
      }
    }
    w.result()
  }

  def ddDecode(bytes: Array[Byte]): GenericArrayData = {
    val r = new ByteReader(bytes)
    // Corruption guard: each element costs >= 1 payload byte (varint),
    // so a count past bytes.length can only come from a corrupt or
    // truncated cell — fail descriptively instead of attempting a
    // multi-GB allocation or walking off the buffer. Validate the FULL
    // 64-bit count before narrowing: a corrupt varint like 2^32 would
    // truncate to 0 and silently decode as an empty array.
    val nL = r.readVarLong()
    require(nL >= 0L && nL <= bytes.length.toLong,
      s"dd_decode: corrupt payload — element count $nL exceeds the " +
        s"${bytes.length}-byte cell's capacity")
    val n = nL.toInt
    val out = new Array[Long](n)
    if (n > 0) {
      out(0) = unzigzag(r.readVarLong())
      var delta = 0L
      var i = 1
      while (i < n) {
        if (i == 1) delta = unzigzag(r.readVarLong())
        else delta += unzigzag(r.readVarLong())
        out(i) = out(i - 1) + delta
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  private def elemLong(arr: ArrayData, i: Int): Long = {
    require(!arr.isNullAt(i), s"dd_encode: null element at index $i")
    arr.getLong(i)
  }

  // ---- Gorilla XOR (doubles) ------------------------------------------

  private final class BitWriter(val bytes: ByteWriter) {
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { bytes.writeRawByte(cur); cur = 0; nBits = 0 }
    }
    def writeBits(v: Long, width: Int): Unit = {
      var k = width - 1
      while (k >= 0) { writeBit(((v >>> k) & 1L).toInt); k -= 1 }
    }
    def flush(): Unit =
      if (nBits > 0) { bytes.writeRawByte(cur << (8 - nBits)); cur = 0; nBits = 0 }
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var p = startByte
    private var nBits = 0
    def readBit(): Int = {
      val b = (bytes(p) >>> (7 - nBits)) & 1
      nBits += 1
      if (nBits == 8) { nBits = 0; p += 1 }
      b
    }
    def readBits(width: Int): Long = {
      var out = 0L
      var k = 0
      while (k < width) { out = (out << 1) | readBit().toLong; k += 1 }
      out
    }
  }

  def gorillaEncode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val bw = new ByteWriter
    bw.writeVarLong(n.toLong)
    val bits = new BitWriter(bw)
    if (n > 0) {
      var prev = elemBits(arr, 0)
      bits.writeBits(prev, 64)
      var prevLead = 65 // sentinel: no window yet
      var prevLen = 0
      var i = 1
      while (i < n) {
        val cur = elemBits(arr, i)
        val x = cur ^ prev
        if (x == 0L) bits.writeBit(0)
        else {
          bits.writeBit(1)
          val lead = math.min(java.lang.Long.numberOfLeadingZeros(x), 31)
          val trail = java.lang.Long.numberOfTrailingZeros(x)
          val len = 64 - lead - trail
          if (prevLead <= 31 && lead >= prevLead &&
              lead + len <= prevLead + prevLen) {
            // meaningful bits fit the previous window: '0' + bits
            bits.writeBit(0)
            bits.writeBits(x >>> (64 - prevLead - prevLen), prevLen)
          } else {
            bits.writeBit(1)
            bits.writeBits(lead.toLong, 5)
            bits.writeBits((len - 1).toLong, 6)
            bits.writeBits(x >>> trail, len)
            prevLead = lead
            prevLen = len
          }
        }
        prev = cur
        i += 1
      }
    }
    bits.flush()
    bw.result()
  }

  def gorillaDecode(bytes: Array[Byte]): GenericArrayData = {
    val r = new ByteReader(bytes)
    // Corruption guard: each element costs >= 1 bit after the 64-bit
    // header, so n can never exceed 8*bytes — a larger count means a
    // corrupt or truncated cell. Full-width check before narrowing
    // (a 2^32 varint must not truncate to an innocuous 0).
    val nL = r.readVarLong()
    // the Int.MaxValue clause keeps the nL.toInt narrowing exact even
    // for cells past ~268 MB, where 8*len alone would admit a 33-bit
    // count that truncates silently
    require(nL >= 0L && nL <= 8L * bytes.length && nL <= Int.MaxValue,
      s"gorilla_decode: corrupt payload — element count $nL exceeds the " +
        s"${bytes.length}-byte cell's capacity")
    val n = nL.toInt
    val out = new Array[Double](n)
    if (n > 0) {
      val bits = new BitReader(bytes, r.pos)
      var prev = bits.readBits(64)
      out(0) = java.lang.Double.longBitsToDouble(prev)
      var lead = 0
      var len = 0
      var i = 1
      while (i < n) {
        if (bits.readBit() == 0) out(i) = java.lang.Double.longBitsToDouble(prev)
        else {
          if (bits.readBit() == 1) {
            lead = bits.readBits(5).toInt
            len = bits.readBits(6).toInt + 1
          }
          val meaningful = bits.readBits(len)
          val x = meaningful << (64 - lead - len)
          prev = prev ^ x
          out(i) = java.lang.Double.longBitsToDouble(prev)
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  private def elemBits(arr: ArrayData, i: Int): Long = {
    require(!arr.isNullAt(i), s"gorilla_encode: null element at index $i")
    java.lang.Double.doubleToRawLongBits(arr.getDouble(i))
  }

  // ---- T64 (longs): crop-and-transpose blocks --------------------------
  //
  // Original rendering of the published T64 idea (the third codec in
  // the reference's per-column triple, clickhouse_schema.py:130-131:
  // close_unixtime/trades CODEC(T64)): values are grouped into blocks
  // of 64; each block stores its minimum, then the remaining deltas
  // BIT-TRANSPOSED — plane j holds bit j of every delta — and only the
  // planes up to the block's maximum significant bit are written. A
  // low-range integer column (trade counts, bounded gauges) costs
  // width(max−min) bits per value instead of 64; a constant block
  // costs its header alone. Unlike DoubleDelta it needs no ordering
  // assumption — the win comes from range, not stride — which is why
  // the reference pairs it with count-like columns.
  //
  // Layout: varint n, then per block: varint zigzag(min), raw byte
  // width, width planes of ceil(k/8) bytes (k = values in the block,
  // LSB-first within each plane byte). Not byte-compatible with any
  // engine's internal format by design.

  private val T64Block = 64

  def t64Encode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val w = new ByteWriter
    w.writeVarLong(n.toLong)
    var b0 = 0
    while (b0 < n) {
      val k = math.min(T64Block, n - b0)
      // block min under UNSIGNED ordering of the signed longs' offset
      // range: min as signed keeps deltas = v - min non-negative in
      // unsigned arithmetic for any signed inputs
      var mn = elemT64(arr, b0)
      var i = 1
      while (i < k) {
        val v = elemT64(arr, b0 + i)
        if (v < mn) mn = v
        i += 1
      }
      var maxD = 0L
      i = 0
      while (i < k) {
        val d = elemT64(arr, b0 + i) - mn // non-negative unsigned
        if (java.lang.Long.compareUnsigned(d, maxD) > 0) maxD = d
        i += 1
      }
      val width = 64 - java.lang.Long.numberOfLeadingZeros(maxD)
      w.writeVarLong(zigzag(mn))
      w.writeRawByte(width)
      val planeBytes = (k + 7) >> 3
      var j = 0
      while (j < width) {
        var byteIdx = 0
        while (byteIdx < planeBytes) {
          var b = 0
          var bit = 0
          val lim = math.min(8, k - (byteIdx << 3))
          while (bit < lim) {
            val d = elemT64(arr, b0 + (byteIdx << 3) + bit) - mn
            b |= (((d >>> j) & 1L).toInt << bit)
            bit += 1
          }
          w.writeRawByte(b)
          byteIdx += 1
        }
        j += 1
      }
      b0 += k
    }
    w.result()
  }

  def t64Decode(bytes: Array[Byte]): GenericArrayData = {
    val r = new ByteReader(bytes)
    // corruption guard (dd_decode discipline): every 64-value block
    // costs at least 2 payload bytes, so a count beyond 64x the cell
    // size is impossible for a well-formed cell. Range-check the raw
    // 64-bit varint BEFORE narrowing — a corrupt count like 2^32 would
    // otherwise truncate to 0 and silently decode as an empty array
    // instead of raising.
    val nL = r.readVarLong()
    // the Int.MaxValue clause keeps the nL.toInt narrowing exact even
    // for cells past ~67 MB, where 64*len alone would admit a 33-bit
    // count that truncates silently
    require(nL >= 0L && nL <= bytes.length.toLong * T64Block &&
      nL <= Int.MaxValue,
      s"t64_decode: corrupt payload — element count $nL exceeds the " +
        s"${bytes.length}-byte cell's capacity")
    val n = nL.toInt
    val out = new Array[Long](n)
    var b0 = 0
    while (b0 < n) {
      val k = math.min(T64Block, n - b0)
      val mn = unzigzag(r.readVarLong())
      val width = r.readRawByte()
      require(width >= 0 && width <= 64,
        s"t64_decode: corrupt payload — plane width $width outside [0, 64]")
      val planeBytes = (k + 7) >> 3
      val deltas = new Array[Long](k)
      var j = 0
      while (j < width) {
        var byteIdx = 0
        while (byteIdx < planeBytes) {
          val b = r.readRawByte()
          var bit = 0
          val lim = math.min(8, k - (byteIdx << 3))
          while (bit < lim) {
            deltas((byteIdx << 3) + bit) |= ((b >> bit) & 1).toLong << j
            bit += 1
          }
          byteIdx += 1
        }
        j += 1
      }
      var i = 0
      while (i < k) { out(b0 + i) = mn + deltas(i); i += 1 }
      b0 += k
    }
    new GenericArrayData(out)
  }

  private def elemT64(arr: ArrayData, i: Int): Long = {
    require(!arr.isNullAt(i), s"t64_encode: null element at index $i")
    arr.getLong(i)
  }

  // ---- Column API ------------------------------------------------------

  def dd_encode(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(DdEncode(GraftBridge.expression(c)))
  }
  def dd_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(DdDecode(GraftBridge.expression(c)))
  }
  def gorilla_encode(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(GorillaEncode(GraftBridge.expression(c)))
  }
  def gorilla_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(GorillaDecode(GraftBridge.expression(c)))
  }
  def t64_encode(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(T64Encode(GraftBridge.expression(c)))
  }
  def t64_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(T64Decode(GraftBridge.expression(c)))
  }
}

case class DdEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    Codecs.ddEncode(input.asInstanceOf[ArrayData])
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Codecs$$.MODULE$$.ddEncode($c);")
  override protected def withNewChildInternal(newChild: Expression): DdEncode =
    copy(child = newChild)
}

case class DdDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Codecs.ddDecode(input.asInstanceOf[Array[Byte]])
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Codecs$$.MODULE$$.ddDecode($c);")
  override protected def withNewChildInternal(newChild: Expression): DdDecode =
    copy(child = newChild)
}

case class GorillaEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    Codecs.gorillaEncode(input.asInstanceOf[ArrayData])
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Codecs$$.MODULE$$.gorillaEncode($c);")
  override protected def withNewChildInternal(newChild: Expression): GorillaEncode =
    copy(child = newChild)
}

case class GorillaDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Codecs.gorillaDecode(input.asInstanceOf[Array[Byte]])
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Codecs$$.MODULE$$.gorillaDecode($c);")
  override protected def withNewChildInternal(newChild: Expression): GorillaDecode =
    copy(child = newChild)
}

case class T64Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    Codecs.t64Encode(input.asInstanceOf[ArrayData])
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Codecs$$.MODULE$$.t64Encode($c);")
  override protected def withNewChildInternal(newChild: Expression): T64Encode =
    copy(child = newChild)
}

case class T64Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Codecs.t64Decode(input.asInstanceOf[Array[Byte]])
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Codecs$$.MODULE$$.t64Decode($c);")
  override protected def withNewChildInternal(newChild: Expression): T64Decode =
    copy(child = newChild)
}
