package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Similarity, TextAnalysis}

/** Semantic checks for the model-eval batch (q183 kNN classify, q184
  * confusion matrix, q185 KS test): exact in-memory replays. */
class Round11EvalSpec extends SparkSpec {
  import spark.implicits._

  test("q183 equals a brute-force leave-one-out kNN vote") {
    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d, na, nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = vecs.map { q =>
      val top = vecs.filter(_._1 != q._1)
        .map(c => (cos(q._3, c._3), c._1, c._2))
        .sortBy { case (s, id, _) => (-s, id) }.take(5)
      val votes = top.groupBy(_._3).view.mapValues(_.length).toMap
      val (pred, n) = votes.toSeq.minBy { case (l, n) => (-n, l) }
      (q._1, q._2, pred, n.toLong, pred == q._2)
    }.toSet
    val got = Similarity.q183KnnClassify(spark, sf)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q184 confusion matrix row-shares sum to 1 and count every document") {
    val got = TextAnalysis.q184LangConfusion(spark, sf)
      .as[(String, String, Long, Double, Boolean)].collect()
    val total = sources.Tables.documents(spark, sf).count()
    assert(got.map(_._3).sum === total)
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, s"lang $lang")
    }
    // the hit flag is consistent with the labels
    got.foreach { case (l, p, _, _, hit) => assert(hit === (l == p)) }
    // replay from q47's own output
    val pred = TextAnalysis.q47LangId(spark, sf)
      .select($"doc_id", $"lang_pred").as[(Long, String)].collect().toMap
    val truth = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val want = truth.groupBy(d => (d._2, pred(d._1))).view
      .mapValues(_.length.toLong).toMap
    assert(got.map(r => (r._1, r._2) -> r._3).toMap === want)
  }

  test("q185 equals a sorted-merge KS replay over every source pair") {
    val scores = Corpus.q121QualityClassifier(spark, sf)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    val bySource = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(d => scores(d._1)).sorted).toMap
    val allScores = scores.values.toSeq.distinct.sorted
    val want = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
    } yield {
      val (xa, xb) = (bySource(a), bySource(b))
      val d = allScores.map { s =>
        math.abs(xa.count(_ <= s).toDouble / xa.length -
          xb.count(_ <= s).toDouble / xb.length)
      }.max
      val thr = 1.358 * math.sqrt((xa.length + xb.length).toDouble /
        (xa.length.toLong * xb.length).toDouble)
      (a, b, xa.length.toLong, xb.length.toLong, d, thr, d > thr)
    }).toSet
    val got = Corpus.q185KsTest(spark, sf)
      .as[(String, String, Long, Long, Double, Double, Boolean)]
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
