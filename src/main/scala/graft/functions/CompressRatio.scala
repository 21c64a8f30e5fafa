package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressibility quality signal as a native Catalyst expression.
  *
  * `compress_ratio(text) -> double`: deflate(level 6, raw) output bytes
  * over input UTF-8 bytes. Highly repetitive, templated, or
  * low-entropy documents compress far below natural prose (~0.2 vs
  * ~0.6), making the ratio a cheap corpus-quality gate that needs no
  * token model — the standard compressibility filter in web-corpus
  * quality stacks, complementing the repetition ratios of
  * [[TextSignals]] (which count exact dup lines/ngrams; deflate also
  * catches approximate and long-range repetition).
  *
  * Row-local (no shuffle), codegen'd via a static kernel call; the
  * Deflater is thread-local and reset per row, so the hot path does no
  * native allocation. Empty input yields 1.0 (incompressible by
  * convention).
  */
case class CompressRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      CompressRatio.ratioKernel(input.asInstanceOf[UTF8String].getBytes))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressRatio$$.MODULE$$.ratioKernel($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): CompressRatio =
    copy(child = newChild)
}

object CompressRatio {

  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6, true)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Row-local kernel shared by interpreted eval and generated code. */
  def ratioKernel(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val b = buf.get()
    var out = 0L
    while (!d.finished()) out += d.deflate(b)
    out.toDouble / bytes.length
  }

  /** Row-local roundtrip proof: deflate then inflate and compare —
    * the losslessness contract behind every ratio this family
    * publishes. Costs ~2× the ratio kernel; audit-path only.
    */
  def roundtripKernel(bytes: Array[Byte]): Boolean = {
    if (bytes.length == 0) return true
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val b = buf.get()
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length / 2))
    while (!d.finished()) {
      val n = d.deflate(b)
      out.write(b, 0, n)
    }
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(out.toByteArray)
      val back = new Array[Byte](bytes.length + 1)
      var got = 0
      while (!inf.finished() && got <= bytes.length)
        got += inf.inflate(back, got, back.length - got)
      got == bytes.length &&
        java.util.Arrays.equals(back, 0, got, bytes, 0, bytes.length)
    } finally inf.end()
  }

  /** Column helper. */
  def compress_ratio(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CompressRatio(GraftBridge.expression(text)))
  }

  /** Column helper for the roundtrip audit. */
  def compress_roundtrip_ok(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CompressRoundtrip(GraftBridge.expression(text)))
  }
}

/** `compress_roundtrip_ok(text) -> boolean`: inflate(deflate(text)) ==
  * text, the losslessness proof for [[CompressRatio]]'s measurement.
  * Row-local, codegen'd; see [[CompressRatio.roundtripKernel]].
  */
case class CompressRoundtrip(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      CompressRatio.roundtripKernel(input.asInstanceOf[UTF8String].getBytes))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressRatio$$.MODULE$$.roundtripKernel($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): CompressRoundtrip =
    copy(child = newChild)
}
