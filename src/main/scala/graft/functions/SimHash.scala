package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash document fingerprint as a native Catalyst expression.
  *
  * `simhash64(tokens: array<string>) -> long`: per token, a 64-bit hash
  * (first 8 bytes of MD5, big-endian — chosen so a SQL oracle can
  * reproduce it with `md5()` + hex parsing); per bit, a +1/-1 vote over
  * all tokens (frequency-weighted); the fingerprint sets bit j iff the
  * vote is positive. Near-duplicate docs then differ in few bits
  * (hamming distance over the fingerprints).
  *
  * A custom Expression (not a UDF) so it is null-safe, serializes into
  * the plan, and evaluates row-local with zero allocation per token
  * beyond the digest. Row-local → embarrassingly parallel, no shuffle.
  * Codegen emits a call to the row-local kernel ([[SimHash64.hashArray]])
  * so the expression stays inside whole-stage codegen — no
  * CodegenFallback boxing/row-copy in the hot path.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.hashArray(input.asInstanceOf[ArrayData]))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64$$.MODULE$$.hashArray($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Row-local SimHash kernel over a token array — called from both the
    * interpreted eval and the generated code.
    */
  def hashArray(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash64(arr.getUTF8String(i).toString)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** First 8 bytes of MD5(token), big-endian — numerically equal to
    * parsing the first 16 hex chars of the md5 digest as an unsigned
    * 64-bit integer (what the SQL oracle does).
    */
  def tokenHash64(tok: String): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(tok.getBytes(StandardCharsets.UTF_8))
    ByteBuffer.wrap(bytes, 0, 8).getLong
  }

  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
  }
}
