package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StructField, StructType}

/** Per-document hashing-TF histogram as a native Catalyst expression.
  *
  * `hash_tf(tokens: array<string>, dim) -> struct<tf: map<long,long>,
  * n2: long>`: each non-empty token hashes to a bucket in `[0, dim)` —
  * the first 4 MD5 bytes read as an unsigned int, mod dim, numerically
  * identical to the SQL-oracle form `CAST(('0x' ||
  * substr(md5(tok),1,8)) AS BIGINT) % dim` — `tf` carries the in-doc
  * count per touched bucket and `n2` the squared L2 norm (sum of
  * squared counts), both from one pass over the tokens.
  *
  * The point is the shuffle this deletes: the explode → groupBy →
  * window formulation of sparse TF shuffled every token row twice
  * (count aggregation + per-doc norm window) before similarity work
  * could start. Counting inside the row makes the whole TF frame —
  * counts AND norms — a narrow projection of the document scan; at
  * 100 TB the first exchange of a text-similarity query is then the
  * (already candidate-pruned) inverted-index join, never the corpus.
  *
  * Row-local kernel shared by interpreted eval and codegen, same
  * pattern as [[SimHash64]] — stays inside whole-stage codegen (the
  * norm as a struct field instead of an `aggregate` HOF matters: a
  * higher-order function here would evaluate interpreted per exploded
  * row and knock the projection out of codegen).
  */
case class HashTf(child: Expression, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = HashTf.outType

  override def nullSafeEval(input: Any): Any =
    HashTf.tfStruct(input.asInstanceOf[ArrayData], dim)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashTf$$.MODULE$$.tfStruct($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashTf =
    copy(child = newChild)
}

object HashTf {
  val outType: StructType = StructType(Seq(
    StructField("tf", MapType(LongType, LongType, valueContainsNull = false),
      nullable = false),
    StructField("n2", LongType, nullable = false)))

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 bytes of MD5(token) as an unsigned int, mod dim — equal to
    * parsing the first 8 hex chars of the md5 digest as hex (what the
    * SQL oracle reproduces with string functions).
    */
  def bucket(tok: String, dim: Int): Long = {
    val md = digest.get()
    md.reset()
    val b = md.digest(tok.getBytes(StandardCharsets.UTF_8))
    val u = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    u % dim
  }

  /** Row-local TF kernel: bucket counts + squared norm over a token
    * array (empty tokens skipped, matching the exploded form's
    * `__tok <> ''` filter). Insertion-ordered for deterministic layout.
    */
  def tfStruct(arr: ArrayData, dim: Int): InternalRow = {
    val counts = new java.util.LinkedHashMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (tok.numBytes() > 0) {
          val b = java.lang.Long.valueOf(bucket(tok.toString, dim))
          val prev = counts.get(b)
          counts.put(b,
            java.lang.Long.valueOf(if (prev == null) 1L else prev.longValue() + 1L))
        }
      }
      i += 1
    }
    val n = counts.size()
    val keys = new Array[Any](n)
    val values = new Array[Any](n)
    var n2 = 0L
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey.longValue()
      val c = e.getValue.longValue()
      values(j) = c
      n2 += c * c
      j += 1
    }
    val map = new ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(values))
    new GenericInternalRow(Array[Any](map, n2))
  }

  def hash_tf(tokens: Column, dim: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(HashTf(GraftBridge.expression(tokens), dim))
  }
}
