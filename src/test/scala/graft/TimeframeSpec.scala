package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.Timeframe

class TimeframeSpec extends AnyFunSuite {

  /** Plain-scalacheck property driver (no scalatest bridge on the
    * offline classpath): deterministic seeds, n samples.
    */
  def forAllSamples[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  test("parses the reference grammar ^(\\d+)([smhdw])$") {
    assert(Timeframe.parse("1m") == Timeframe(1, 'm'))
    assert(Timeframe.parse("15m").seconds == 900L)
    assert(Timeframe.parse("2h").seconds == 7200L)
    assert(Timeframe.parse("1d").seconds == 86400L)
    assert(Timeframe.parse("1w").seconds == 604800L)
    assert(Timeframe.parse("30s").seconds == 30L)
  }

  test("rejects malformed timeframes") {
    for (bad <- Seq("", "m", "15", "15x", "-5m", "1.5h", "1M"))
      assertThrows[IllegalArgumentException](Timeframe.parse(bad))
  }

  test("spark interval strings round-trip the span") {
    assert(Timeframe.parse("15m").sparkInterval == "15 minutes")
    assert(Timeframe.parse("2h").sparkInterval == "2 hours")
    assert(Timeframe.parse("1w").sparkInterval == "7 days")
  }

  test("reference rollup cascade divisibility (clickhouse_schema.py:98-99)") {
    val grains = Timeframe.RollupGrains
    assert(grains.map(_.seconds) ==
      Seq(60L, 300L, 900L, 1800L, 3600L, 7200L, 14400L, 86400L))
    // each grain divides the next (the property the MV cascade requires)
    grains.sliding(2).foreach { case Seq(finer, coarser) =>
      assert(finer.divides(coarser), s"${finer.label} should divide ${coarser.label}")
    }
  }

  test("property: parse(label) is identity") {
    val gen = for {
      n <- Gen.choose(1, 10000)
      u <- Gen.oneOf('s', 'm', 'h', 'd', 'w')
    } yield Timeframe(n, u)
    forAllSamples(gen) { tf =>
      assert(Timeframe.parse(tf.label) == tf)
      assert(tf.seconds > 0)
    }
  }
}
