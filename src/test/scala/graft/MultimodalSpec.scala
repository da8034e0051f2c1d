package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table has the binary+metadata schema") {
    val m = Multimodal.mediaFromDocuments(spark, sf)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    assert(shape(m.schema) === shape(Multimodal.mediaSchema))
    val kinds = m.select($"kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("decodeStub preserves rows and partitioning, deterministic features") {
    val m = Multimodal.mediaFromDocuments(spark, sf).repartition(3)
    val f1 = Multimodal.decodeStub(m)
    assert(f1.schema === Multimodal.featureSchema)
    assert(f1.count() === m.count())
    assert(f1.rdd.getNumPartitions === 3, "batched decode must not shuffle")
    val c1 = f1.select($"media_id", $"checksum").as[(Long, Long)].collect().toMap
    val c2 = Multimodal.decodeStub(m).select($"media_id", $"checksum")
      .as[(Long, Long)].collect().toMap
    assert(c1 === c2)
    // feature vectors are normalized byte histograms → sum ≈ 1
    val sums = f1.select(aggregate($"feature", lit(0.0d), (a, x) => a + x.cast("double")))
      .as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-3))
  }

  test("frameSample emits fixed-size frames for video only") {
    val m = Multimodal.mediaFromDocuments(spark, sf)
    val frames = Multimodal.frameSample(m, frameBytes = 16, stride = 2)
    val kinds = frames.join(m, "media_id").select($"kind").distinct().as[String].collect().toSet
    assert(kinds === Set("video"))
    val lens = frames.select(length($"frame_bytes")).as[Int].collect()
    assert(lens.forall(_ <= 16) && lens.exists(_ == 16))
  }
}
