package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.{ChangefeedSource, DirTail, KafkaTopic}

/** The transport seam: dir-tail and Kafka bindings must be one-config
  * swaps under the same decoders, with the Kafka wiring assertable without
  * a broker (the connector jar isn't bundled, so the option map is pure). */
class ChangefeedSourceSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("dir-tail through the seam wires from_json onto the value column") {
    val dir = Files.createTempDirectory("feed").toFile
    Files.write(dir.toPath.resolve("a.jsonl"),
      """{"op":"c","ts_ms":1,"after":{"id":1,"v":"x"}}""".getBytes)
    val src: ChangefeedSource = DirTail(dir.getAbsolutePath)
    val decoded = src.debezium(spark, rowSchema)
    assert(decoded.isStreaming)
    val lp = decoded.queryExecution.analyzed.toString
    assert(lp.contains("from_json"), s"decode not plan-level:\n$lp")
    assert(lp.contains("value"), s"not bound to the value column:\n$lp")
    assert(decoded.columns.toSeq === Seq("id", "v", "version", "op"))
    // and the canal decoder bolts onto the SAME transport
    assert(src.canal(spark, rowSchema).columns.toSeq ===
      Seq("id", "v", "version", "op"))
  }

  test("Kafka binding carries the broker/topic config and value contract") {
    val k = KafkaTopic("broker1:9092,broker2:9092", "orders.cdc",
      extraOptions = Map("maxOffsetsPerTrigger" -> "5000"))
    assert(k.readerOptions === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "orders.cdc",
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> "5000"))
    // the decoders see only `value` — the one column both transports share
    val d = KafkaTopic("b:9092", "t", startingOffsets = "latest")
    assert(d.readerOptions("startingOffsets") === "latest")
  }

  test("Kafka wiring is exactly Spark's kafka-source contract (jar-swap pin)") {
    // the binding stays plan-level without the connector jar; this pin
    // keeps the one-line swap honest: option KEYS must be names Spark's
    // kafka source actually reads (a rename to e.g. 'topic' or
    // 'bootstrap.servers' would silently no-op on a real cluster)
    val k = KafkaTopic("b1:9092,b2:9092", "orders.cdc")
    val sparkKafkaOptionNames = Set( // the documented source options
      "subscribe", "subscribepattern", "assign",
      "startingoffsets", "endingoffsets", "startingtimestamp",
      "startingoffsetsbytimestamp", "failondataloss",
      "maxoffsetspertrigger", "minoffsetspertrigger", "maxtriggerdelay",
      "minpartitions", "groupidprefix", "includeheaders",
      "kafkaconsumer.polltimeoutms", "fetchoffset.numretries",
      "fetchoffset.retryintervalms")
    k.readerOptions.keys.foreach { o =>
      assert(sparkKafkaOptionNames.contains(o.toLowerCase)
        || o.toLowerCase.startsWith("kafka."), // pass-through consumer conf
        s"option '$o' is not in Spark's kafka-source contract")
    }
    // exactly ONE subscription mode, and the broker list under the
    // kafka.-prefixed key the source requires
    assert(k.readerOptions.keySet
      .count(o => Set("subscribe", "subscribepattern", "assign")
        .contains(o.toLowerCase)) === 1)
    assert(k.readerOptions("kafka.bootstrap.servers") === "b1:9092,b2:9092")
    // and frame() really asks Spark for the `kafka` FORMAT: without the
    // connector jar the lookup fails BY NAME — proving the jar is the
    // only missing piece of the swap
    val e = intercept[Exception] { k.frame(spark) }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"frame() did not resolve through the kafka format: ${e.getMessage}")
  }
}
