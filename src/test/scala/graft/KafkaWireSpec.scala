package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{CandleAssembler, KafkaWire}
import graft.streaming.CandleAssembler.Trade

/** The Kafka-shaped S1 wiring: the seam is the connector's fixed wire
  * schema, so a MemoryStream of [[KafkaWire.Record]] drives exactly the
  * frame a real broker would — no socket required, per SURVEY §2.1's
  * in-sandbox source substitution.
  */
class KafkaWireSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def rec(json: String, off: Long): KafkaWire.Record =
    KafkaWire.Record(null, json.getBytes("UTF-8"), "trades", 0, off,
      ts("2024-03-01 08:00:00"), 0)

  private def payload(sym: String, t: Timestamp, price: Double, qty: Double): String =
    s"""{"symbol":"$sym","ts":${t.getTime},"price":$price,"qty":$qty}"""

  test("wire decode: JSON payloads become trades; poison messages drop, never kill") {
    val wire = Seq(
      rec(payload("BTC", ts("2024-03-01 08:00:01"), 100.0, 2.0), 0),
      rec("not json at all", 1),
      rec("""{"symbol":"BTC","ts":"yesterday","price":1,"qty":1}""", 2),
      rec("""{"symbol":"ETH","ts":1709280030000,"price":10.0}""", 3), // missing qty
      rec(payload("ETH", ts("2024-03-01 08:00:30"), 10.0, 0.0), 4),   // qty <= 0
      rec(payload("ETH", ts("2024-03-01 08:00:30"), 10.0, 10.0), 5)
    ).toDF()
    val got = KafkaWire.trades(wire).collect().toSet
    assert(got == Set(
      Trade("BTC", ts("2024-03-01 08:00:01"), 100.0, 2.0),
      Trade("ETH", ts("2024-03-01 08:00:30"), 10.0, 10.0)))
  }

  test("kafka-shaped stream assembles the same candles as the plain Trade twin") {
    implicit val sqlCtx = spark.sqlContext
    val trades = Seq(
      Trade("BTC", ts("2024-03-01 08:00:01"), 100.0, 2.0),
      Trade("BTC", ts("2024-03-01 08:00:15"), 105.0, 1.0),
      Trade("BTC", ts("2024-03-01 08:00:50"), 95.0, 1.0),
      Trade("ETH", ts("2024-03-01 08:00:30"), 10.0, 10.0))
    val seal = Trade("BTC", ts("2024-03-01 08:10:00"), 1.0, 1.0)

    // kafka-shaped source (with an interleaved poison record)
    val kafkaSrc = MemoryStream[KafkaWire.Record]
    val qk = KafkaWire.assembledCandles(
        kafkaSrc.toDS().toDF(), grainMs = 60000L, watermark = "30 seconds")
      .writeStream.outputMode("append").format("memory").queryName("kw_kafka").start()
    // plain Trade twin
    val plainSrc = MemoryStream[Trade]
    val qp = CandleAssembler.assemble(
        plainSrc.toDS(), grainMs = 60000L, watermark = "30 seconds")
      .writeStream.outputMode("append").format("memory").queryName("kw_plain").start()
    try {
      kafkaSrc.addData(trades.zipWithIndex.map { case (t, i) =>
        rec(payload(t.symbol, t.ts, t.price, t.qty), i.toLong) } :+ rec("poison", 99L): _*)
      qk.processAllAvailable()
      kafkaSrc.addData(rec(payload(seal.symbol, seal.ts, seal.price, seal.qty), 100L))
      qk.processAllAvailable()

      plainSrc.addData(trades: _*)
      qp.processAllAvailable()
      plainSrc.addData(seal)
      qp.processAllAvailable()

      def sealedOut(table: String) = spark.table(table)
        .filter($"bucket_ts" < ts("2024-03-01 08:05:00"))
        .as[CandleAssembler.AssembledCandle]
        .collect().map(_.toString).toSet
      val viaKafka = sealedOut("kw_kafka")
      val viaPlain = sealedOut("kw_plain")
      assert(viaKafka == viaPlain, s"$viaKafka vs $viaPlain")
      assert(viaKafka.size == 2) // BTC 08:00 + ETH 08:00
    } finally { qk.stop(); qp.stop() }
  }
}
