package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.functions.Codecs

/** Per-column codec contracts: exact round-trip identity on
  * adversarial value sweeps (kernel level and inside a Spark plan),
  * golden-bytes stability (a silent format change would corrupt every
  * persisted serialized-state cell), and the compression claims the
  * operator docs make (regular epoch grid ~1 byte/value under
  * DoubleDelta; slow-moving doubles well under 8 bytes/value under
  * Gorilla XOR).
  */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  private def ddRoundTrip(xs: Array[Long]): Array[Long] =
    Codecs.ddDecode(Codecs.ddEncode(new GenericArrayData(xs))).toLongArray()

  private def gorRoundTrip(xs: Array[Double]): Array[Double] =
    Codecs.gorillaDecode(Codecs.gorillaEncode(new GenericArrayData(xs))).toDoubleArray()

  test("DoubleDelta round-trips adversarial long sweeps exactly") {
    val cases = Seq[Array[Long]](
      Array.empty,
      Array(0L),
      Array(Long.MaxValue),
      Array(Long.MinValue),
      Array(Long.MinValue, Long.MaxValue, Long.MinValue),
      Array(5L, 5L, 5L, 5L),
      (0 until 1000).map(i => 1700000000000000L + i * 3600000000L).toArray,
      Array(-3L, 7L, -11L, 0L, 42L, -42L))
    cases.foreach { xs =>
      assert(ddRoundTrip(xs).toSeq == xs.toSeq, s"case ${xs.take(4).toSeq}...")
    }
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(60)
      val xs = Array.fill(n)(rnd.nextLong())
      assert(ddRoundTrip(xs).toSeq == xs.toSeq)
    }
  }

  test("Gorilla round-trips adversarial double sweeps bit-exactly") {
    def bitsEq(a: Array[Double], b: Array[Double]): Boolean =
      a.length == b.length && a.indices.forall(i =>
        java.lang.Double.doubleToRawLongBits(a(i)) ==
          java.lang.Double.doubleToRawLongBits(b(i)))
    val cases = Seq[Array[Double]](
      Array.empty,
      Array(0.0),
      Array(-0.0, 0.0, -0.0),
      Array(Double.NaN, 1.0, Double.NaN),
      Array(Double.PositiveInfinity, Double.NegativeInfinity),
      Array(Double.MinPositiveValue, Double.MaxValue),
      Array.fill(50)(123.456),
      (0 until 500).map(i => 100.0 + 0.01 * (i % 7)).toArray)
    cases.foreach { xs =>
      assert(bitsEq(gorRoundTrip(xs), xs), s"case ${xs.take(4).toSeq}...")
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(60)
      val xs = Array.fill(n)(
        if (rnd.nextInt(5) == 0) rnd.nextDouble() * 1e300
        else 100.0 + rnd.nextInt(1000) * 0.01)
      assert(bitsEq(gorRoundTrip(xs), xs))
    }
  }

  private def t64RoundTrip(xs: Array[Long]): Array[Long] =
    Codecs.t64Decode(Codecs.t64Encode(new GenericArrayData(xs))).toLongArray()

  test("T64 round-trips adversarial long sweeps exactly") {
    val cases = Seq[Array[Long]](
      Array.empty,
      Array(0L),
      Array(Long.MaxValue),
      Array(Long.MinValue),
      Array(Long.MinValue, Long.MaxValue, Long.MinValue), // full 64-bit range
      Array.fill(64)(7L),                                 // constant full block
      Array.fill(65)(7L),                                 // block boundary + 1
      (0 until 1000).map(i => 1700000000L + i * 3600L).toArray,
      (0 until 130).map(i => (i % 17).toLong).toArray,    // low-range counts
      Array(-3L, 7L, -11L, 0L, 42L, -42L))
    cases.foreach { xs =>
      assert(t64RoundTrip(xs).toSeq == xs.toSeq, s"case ${xs.take(4).toSeq}...")
    }
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(200)
      val xs = Array.fill(n)(
        if (rnd.nextInt(4) == 0) rnd.nextLong() else rnd.nextInt(1000).toLong)
      assert(t64RoundTrip(xs).toSeq == xs.toSeq)
    }
  }

  test("T64 compression: width tracks the block RANGE, not the ordering") {
    // shuffled low-range counts — DoubleDelta suffers (unordered), T64
    // packs each value in ceil-log2(range) bits regardless of order
    val rnd = new scala.util.Random(13)
    val counts = rnd.shuffle((0 until 640).map(i => (i % 50).toLong)).toArray
    val t64 = Codecs.t64Encode(new GenericArrayData(counts))
    assert(t64.length < counts.length, // < 8 bits/value for a 6-bit range
      s"t64 ${t64.length} bytes not under 1 byte/value on a 50-range column")
    val dd = Codecs.ddEncode(new GenericArrayData(counts))
    assert(t64.length < dd.length,
      s"t64 ${t64.length} should beat DoubleDelta ${dd.length} on shuffled counts")
  }

  test("corrupt cells fail descriptively, not with a multi-GB allocation") {
    // a varint count far past the payload's capacity (what a truncated
    // or bit-flipped cell produces) must raise, not allocate
    val good = Codecs.ddEncode(new GenericArrayData(Array(1L, 2L, 3L)))
    good(0) = 0xFF.toByte // count varint's low byte now has a continuation bit
    val e1 = intercept[IllegalArgumentException](Codecs.ddDecode(good))
    assert(e1.getMessage.contains("corrupt"))
    val g = Codecs.gorillaEncode(new GenericArrayData(Array(1.0, 2.0)))
    g(0) = 0xFF.toByte
    val e2 = intercept[IllegalArgumentException](Codecs.gorillaDecode(g))
    assert(e2.getMessage.contains("corrupt"))
    val t = Codecs.t64Encode(new GenericArrayData(Array(1L, 2L, 3L)))
    t(0) = 0xFF.toByte
    val e3 = intercept[IllegalArgumentException](Codecs.t64Decode(t))
    assert(e3.getMessage.contains("corrupt"))
  }

  test("golden bytes: the serialized formats are pinned (md5)") {
    // A format change silently corrupts every persisted cell — pin the
    // exact bytes of two representative series.
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    val grid = (0 until 24).map(i => 1700000000000000L + i * 3600000000L).toArray
    val px = (0 until 24).map(i => 100.0 + 0.25 * (i % 4)).toArray
    val ddBytes = Codecs.ddEncode(new GenericArrayData(grid))
    val gorBytes = Codecs.gorillaEncode(new GenericArrayData(px))
    // regular grid: header + v0 + delta1, then 22 zero double-deltas
    // (1 byte each) — far under 8 bytes/value
    assert(ddBytes.length < grid.length * 8 / 4,
      s"dd bytes ${ddBytes.length} not < 2 bytes/value on a regular grid")
    // 4-value repeating pattern: XOR windows stay narrow
    assert(gorBytes.length < px.length * 8,
      s"gorilla bytes ${gorBytes.length} not under raw")
    val (dh, gh) = (md5hex(ddBytes), md5hex(gorBytes))
    assert(dh == "1f578f2201f687be94fba751e5196038",
      s"DoubleDelta golden bytes changed: $dh")
    assert(gh == "d4e7403b2666ec6c384cfe98eff8a31e",
      s"Gorilla golden bytes changed: $gh")
    // T64: 130 values spanning two full blocks + a partial one
    val counts = (0 until 130).map(i => (i * 7 % 100).toLong).toArray
    val t64Bytes = Codecs.t64Encode(new GenericArrayData(counts))
    assert(t64Bytes.length < counts.length * 8 / 4,
      s"t64 bytes ${t64Bytes.length} not < 2 bytes/value on a 100-range column")
    val th = md5hex(t64Bytes)
    assert(th == "bb1a4503794689b6365008262fae54ed",
      s"T64 golden bytes changed: $th")
  }

  test("inside a Spark plan: packed series round-trip per key and stay codegen") {
    val df = (0 until 200).map { i =>
      (i % 5, 1700000000000000L + i * 3600000000L, 100.0 + 0.01 * (i % 13),
        (i % 23).toLong)
    }.toDF("k", "us", "px", "cnt")
    val packed = df.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("us"), col("px"), col("cnt")))).as("s"))
      .select(col("k"),
        expr("transform(s, x -> x.us)").as("ts"),
        expr("transform(s, x -> x.px)").as("px"),
        expr("transform(s, x -> x.cnt)").as("cnt"))
    val out = packed.select(
      col("k"),
      (Codecs.dd_decode(Codecs.dd_encode(col("ts"))) === col("ts")).as("tok"),
      (Codecs.gorilla_decode(Codecs.gorilla_encode(col("px"))) === col("px")).as("pok"),
      (Codecs.t64_decode(Codecs.t64_encode(col("cnt"))) === col("cnt")).as("cok"),
      length(Codecs.dd_encode(col("ts"))).as("ddb"),
      length(Codecs.t64_encode(col("cnt"))).as("t64b"),
      (size(col("ts")) * 8).as("raw"))
      .as[(Int, Boolean, Boolean, Boolean, Int, Int, Int)].collect()
    assert(out.length == 5)
    assert(out.forall(_._2), "timestamp round-trip failed in-plan")
    assert(out.forall(_._3), "price round-trip failed in-plan")
    assert(out.forall(_._4), "count round-trip failed in-plan")
    assert(out.forall(r => r._5 < r._7 / 4), "regular grid should pack <2 bytes/value")
    assert(out.forall(r => r._6 < r._7 / 4), "5-bit counts should pack <2 bytes/value")
  }
}
