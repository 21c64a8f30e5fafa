package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Full MinHash signature as ONE row-local expression:
  * `minhash_sig(shingles: array<string>) -> array<long>` (null for
  * empty input).
  *
  * Per shingle: ONE md5 (first 8 bytes, reduced mod p = 2^61-1), then
  * k universal-hash permutations h_j = (a_j·x + b_j) mod p — 8x less
  * hashing than md5-per-permutation, and the k minima accumulate in
  * registers, so the whole signature stage is a PROJECTION: no
  * explode, no shuffle of shingle rows, nothing leaves the row. At
  * 100 TB the signature pass is a single map over the corpus.
  *
  * The (a_j, b_j) parameters come from a fixed seed and are inlined
  * into the SQL oracle, which reproduces every signature bit-for-bit
  * with HUGEINT arithmetic (md5 + mulmod are engine-reproducible;
  * xxhash64-style engine hashes are not).
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "need matching a/b parameter vectors")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sigArray(input.asInstanceOf[ArrayData], aArr, bArr)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSig$$.MODULE$$.sigArray($c, $aRef, $bRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Mersenne prime 2^61-1 — mulmod reduces without division. */
  val P: Long = (1L << 61) - 1

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** (a·x) mod p for a, x in [0, p): product < 2^122; 2^64 ≡ 8 and
    * 2^61 ≡ 1 (mod p) fold the 128-bit product exactly (same trick as
    * Winnowing.polyStep, generalized to a full-width multiplier).
    */
  def mulMod61(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // < 2^58 for a, x < 2^61
    val lo = a * x
    val folded = (lo & P) + (lo >>> 61) + (hi << 3)
    val r = (folded & P) + (folded >>> 61)
    if (r >= P) r - P else r
  }

  /** First 8 bytes of md5(shingle) as an unsigned value mod p — the
    * base hash every permutation is derived from.
    */
  def baseHash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    java.lang.Long.remainderUnsigned(ByteBuffer.wrap(d, 0, 8).getLong, P)
  }

  /** Row-local signature kernel — called from both the interpreted
    * eval and the generated code. Null for empty input (a doc too
    * short to shingle has no signature, matching the WHERE len >= n
    * guard in the oracle).
    */
  def sigArray(shingles: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return null
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val x = baseHash(s.getBytes)
        var j = 0
        while (j < k) {
          val h = {
            val t = mulMod61(a(j), x) + b(j)
            if (t >= P) t - P else t
          }
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Deterministic permutation parameters from a fixed seed: a_j in
    * [1, p), b_j in [0, p). Shared by the expression and the SQL
    * oracle (inlined as literals there).
    */
  def params(k: Int, seed: Long = 90217L): (Seq[Long], Seq[Long]) = {
    val rng = new scala.util.Random(seed)
    def draw(min: Long): Long = {
      var v = rng.nextLong() & Long.MaxValue
      v = v % (P - min) + min
      v
    }
    val a = Seq.fill(k)(draw(1L))
    val b = Seq.fill(k)(draw(0L))
    (a, b)
  }

  def minhash_sig(shingles: Column, k: Int): Column = {
    val (a, b) = params(k)
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles), a, b))
  }
}
