package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Semantic checks for the lossy-image-retrieval and LSH-eval batch
  * (q181, q182). */
class Round11MediaEvalSpec extends SparkSpec {
  import spark.implicits._

  // --- q181 JPEG provenance retrieval ----------------------------------

  test("q181 retrieves the true source through a real lossy JPEG round-trip") {
    val got = Multimodal.q181JpegNearDup(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val jpegs = got.map(_._1).distinct
    assert(jpegs.nonEmpty)
    // nearly every re-encode retrieves its true source within top-k, and
    // rank-1 is the true source for ≥90% — this corpus renders distinct
    // documents into legitimately near-identical noise images, so a
    // handful of sources rank below k behind content that is genuinely
    // at least as close (no threshold separates "same picture re-encoded"
    // from "nearly the same picture")
    val rk = jpegs.count(j => got.exists(r => r._1 == j && r._3 == j))
    assert(rk.toDouble / jpegs.length >= 0.99,
      s"recall@5 ${rk.toDouble / jpegs.length}")
    val r1 = got.count(r => r._2 == 1L && r._1 == r._3)
    assert(r1.toDouble / jpegs.length >= 0.9,
      s"recall@1 ${r1.toDouble / jpegs.length}")
    // well-formed retrieval lists: contiguous ranks from 1, ≤k rows
    got.groupBy(_._1).foreach { case (j, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks === (1L to ranks.length), s"jpeg $j ranks $ranks")
      assert(ranks.length <= 5)
    }
    // the JPEG bytes really differ from the PNG bytes (the lossy round
    // trip is real, not a container relabel)
    val png = Multimodal.imagesFromDocuments(spark, sf)
      .select($"media_id", $"bytes").as[(Long, Array[Byte])].collect().toMap
    val jpg = Multimodal.jpegsFromDocuments(spark, sf)
      .select($"media_id", $"bytes").as[(Long, Array[Byte])].collect().toMap
    jpegs.foreach { j =>
      assert(!java.util.Arrays.equals(png(j), jpg(j)))
    }
  }

  // --- q182 LSH eval ---------------------------------------------------

  test("q182's ground truth and counts are internally and externally consistent") {
    val Array((cap, nTrue, nCand, nTp, prec, rec)) =
      Dedup.q182LshEval(spark, sf)
        .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(cap === 1000L)
    assert(nTp <= math.min(nTrue, nCand))
    assert(prec === (if (nCand > 0) nTp.toDouble / nCand else 1.0))
    assert(rec === (if (nTrue > 0) nTp.toDouble / nTrue else 1.0))
    // independent ground truth: exact word-shingle Jaccard over the same
    // (whole, at this SF) corpus, computed from the kernel's own arrays
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id",
        graft.functions.TextHashFunctions
          .wordShingleHashes($"text", 3).as("sh"))
      .as[(Long, Array[Long])].collect()
    var want = 0L
    for (i <- docs.indices; j <- (i + 1) until docs.length) {
      val a = docs(i)._2.toSet
      val b = docs(j)._2.toSet
      val inter = (a & b).size
      if (a.nonEmpty || b.nonEmpty) {
        val jac = inter.toDouble / (a.size + b.size - inter)
        if (jac >= 0.5) want += 1
      }
    }
    assert(nTrue === want, s"ground truth $nTrue vs brute-force $want")
    assert(nTrue > 0, "eval corpus must contain true near-dup pairs")
  }
}
