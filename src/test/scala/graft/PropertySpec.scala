package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.ChangelogOps

/** Property-based checks (raw ScalaCheck generators, deterministic seeds):
  * operators agree with straightforward reference implementations on
  * randomized inputs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val changelogGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(60, for {
      key <- Gen.choose(1L, 8L)
      version <- Gen.choose(1L, 20L)
      value <- Gen.choose(-100, 100).map(_.toDouble)
    } yield (key, version, value))

  test("latestByKey equals the reference max-version reduction") {
    samples(changelogGen, 10).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k", "v", "x")
      val got = ChangelogOps.latestByKey(df, Seq("k"), "v")
        .select("k", "v").as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(got === want)
    }
  }

  test("jaccard is symmetric, bounded, and 1 iff sets equal (via shingles)") {
    val textGen = Gen.listOfN(12,
      Gen.oneOf("spark", "join", "scan", "agg", "row", "data")).map(_.mkString(" "))
    samples(Gen.zip(textGen, textGen), 8).foreach { case (t1, t2) =>
      val df = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val sh = df.select($"doc_id", graft.operators.Dedup.shingles($"text", 3).as("s"))
      val j12 = sh.as("a").join(sh.as("b"),
          org.apache.spark.sql.functions.col("a.doc_id") === 1 &&
          org.apache.spark.sql.functions.col("b.doc_id") === 2)
        .select(graft.operators.Dedup.jaccard(
          org.apache.spark.sql.functions.col("a.s"),
          org.apache.spark.sql.functions.col("b.s")))
        .as[Double].head()
      assert(j12 >= 0.0 && j12 <= 1.0)
      if (t1 == t2) assert(j12 === 1.0)
    }
  }

  test("minhash signature agreement approximates true jaccard") {
    // two documents sharing a known fraction of shingles
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val variant = ((1 to 30).map(i => s"tok$i") ++ (41 to 50).map(i => s"tok$i")).mkString(" ")
    val df = Seq((1L, base), (2L, variant)).toDF("doc_id", "text")
    val sh = graft.operators.Dedup.shinglesExploded(df, "doc_id", "text", 3)
    val sig = graft.operators.Dedup.signatureFromExploded(sh, "doc_id", "s", 64)
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    val agreement = sig(1L).zip(sig(2L)).count { case (a, b) => a == b } / 64.0
    val trueJ = {
      val s1 = sh.filter($"doc_id" === 1).select("s").as[Long].collect().toSet
      val s2 = sh.filter($"doc_id" === 2).select("s").as[Long].collect().toSet
      s1.intersect(s2).size.toDouble / s1.union(s2).size
    }
    assert(math.abs(agreement - trueJ) < 0.2,
      s"minhash agreement $agreement should approximate true jaccard $trueJ")
  }
}
