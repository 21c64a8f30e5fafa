package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
  * MOSS algorithm) as a native Catalyst expression:
  * `winnow(tokens, k, w) -> array<long>`.
  *
  * Per token, a rolling 61-bit polynomial hash of each k-token gram;
  * over every window of w consecutive gram hashes, keep the rightmost
  * minimum; dedup consecutive picks. Guarantees: any shared token run
  * of length >= k + w - 1 between two documents yields at least one
  * shared fingerprint — the detection floor is tunable, and the
  * fingerprint density is ~2/(w+1) of the grams, so the index is an
  * order of magnitude smaller than full shingling. Row-local, no
  * shuffle; the near-dup search then group-joins on fingerprint values.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Winnowing.winnowArray(input.asInstanceOf[ArrayData], k, w)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnowing$$.MODULE$$.winnowArray($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)
}

object Winnowing {
  private val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1
  private val Base = 1000003L

  /** Row-local winnowing kernel — called from both the interpreted eval
    * and the generated code.
    */
  def winnowArray(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val m = toks.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])

    // rolling polynomial gram hashes over token hashes. Token hash =
    // md5-derived base hash (shared with MinHash): already avalanched,
    // and — unlike UTF8String.hashCode's murmur3 — bit-for-bit
    // reproducible by the SQL oracle.
    val nGrams = m - k + 1
    val gramHash = new Array[Long](nGrams)
    val tokHash = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      tokHash(i) = if (t == null) 0L else MinHashSig.baseHash(t.getBytes)
      i += 1
    }
    var g = 0
    while (g < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = polyStep(h, tokHash(g + j))
        j += 1
      }
      gramHash(g) = h
      g += 1
    }

    // sliding-window rightmost-min selection, dedup consecutive
    val out = new java.util.ArrayList[Any]()
    var lastPickIdx = -1
    var start = 0
    val lastWindow = math.max(nGrams - w, 0)
    while (start <= lastWindow) {
      val end = math.min(start + w, nGrams)
      var minIdx = start
      var j2 = start + 1
      while (j2 < end) {
        if (gramHash(j2) <= gramHash(minIdx)) minIdx = j2 // rightmost min
        j2 += 1
      }
      if (minIdx != lastPickIdx) {
        out.add(java.lang.Long.valueOf(gramHash(minIdx)))
        lastPickIdx = minIdx
      }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** One polynomial step h*B + t (mod 2^61-1), using the Mersenne
    * fast-mod trick on the 128-bit product.
    */
  def polyStep(h: Long, t: Long): Long = {
    // product = hi*2^64 + lo; 2^64 ≡ 8 (mod 2^61-1) and hi < 2^20
    // (h < 2^61, Base < 2^20), so product ≡ (lo & M) + (lo >>> 61) + 8*hi
    val hi = Math.multiplyHigh(h, Base)
    val lo = h * Base
    val folded = (lo & Mod) + (lo >>> 61) + (hi << 3)
    val r = (folded & Mod) + (folded >>> 61)
    val base = if (r >= Mod) r - Mod else r
    val s = base + t
    if (s >= Mod) s - Mod else s
  }

  def winnow(tokens: Column, k: Int, w: Int): Column =
    GraftBridge.column(
      WinnowingFingerprints(GraftBridge.expression(tokens), k, w))

  /** Candidate near-dup pairs: documents sharing >= minShared winnowing
    * fingerprints. explode → group-join on the fingerprint value →
    * count per pair. Same shuffle shape as the MinHash band join, and
    * the same degenerate-bucket exposure: one fingerprint shared by
    * thousands of boilerplate docs makes the self-join quadratic, so
    * fingerprints held by more than `bucketCap` docs are dropped before
    * the join (TextOps.capBuckets — a count window over the join's own
    * shuffle, no extra exchange).
    */
  def winnowNearDupPairs(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      minShared: Int,
      bucketCap: Long = 10000L
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fps = docs.select(
      col(idCol),
      explode(winnow(TextOps.tokens(col(textCol)), k, w)).as("fp"))
      .distinct()
    val guarded = TextOps.capBuckets(fps, Seq("fp"), bucketCap)
    val a = guarded.select(col(idCol).as("doc_a"), col("fp"))
    val b = guarded.select(col(idCol).as("doc_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** What `bucketCap` does to the fingerprint buckets on THIS corpus
    * — the observability companion to [[winnowNearDupPairs]]
    * ([[graft.operators.CapReport.of]]).
    */
  def winnowCapReport(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      bucketCap: Long = 10000L
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fps = docs.select(
      col(idCol),
      explode(winnow(TextOps.tokens(col(textCol)), k, w)).as("fp"))
      .distinct()
    graft.operators.CapReport.of(fps, Seq("fp"), idCol, bucketCap)
  }
}
