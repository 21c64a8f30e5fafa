package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct contiguous word n-gram shingles as a native Catalyst
  * expression: `word_shingles(tokens: array<string>, n) ->
  * array<string>` (space-joined n-grams, first-occurrence order).
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(...,
  * element_at(...)))` composition: higher-order functions evaluate
  * their lambda interpreted per element and re-evaluate inline child
  * subtrees, which made shingling ~300x slower than this loop. Output
  * set is identical (the oracle only depends on the shingle *set*).
  */
case class WordShingles(child: Expression, n: Int, dedup: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    if (dedup) WordShingles.shingleArray(input.asInstanceOf[ArrayData], n)
    else WordShingles.shingleArrayAll(input.asInstanceOf[ArrayData], n)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = if (dedup) "shingleArray" else "shingleArrayAll"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.$kernel($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val space = UTF8String.fromString(" ")

  /** Row-local shingling kernel — called from both the interpreted eval
    * and the generated code.
    */
  def shingleArray(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        window(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** All contiguous n-grams in order, duplicates kept — the counting
    * form behind repetition-quality signals.
    */
  def shingleArrayAll(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        window(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      out(i) = UTF8String.concatWs(space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def word_shingles(tokens: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(tokens), n))

  def word_shingles_all(tokens: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(tokens), n, dedup = false))
}
