package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Skew}

/** Degree-oriented wedge machinery: counting identity vs the naive
  * id-order node-iterator, and the planted-hub skew bounds the verdict
  * asked for (one ~10³-degree vertex must not own a reducer). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a random-ish deterministic graph with real triangles
  private def randomPairs(n: Int, m: Int) = {
    val rnd = new scala.util.Random(7)
    (1 to m).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
  }

  test("degree-oriented triangles equal the naive id-order enumeration") {
    val pairs = randomPairs(40, 220)
    val df = pairs.toDF("a", "b")
    val got = Graph.triangles(df, "a", "b")
      .as[(Long, Long, Long)].collect().toSeq
    val es = pairs.toSet
    val want = (for {
      (a, b) <- pairs; (b2, c) <- pairs
      if b2 == b && es.contains((a, c))
    } yield (a, b, c)).toSet
    assert(got.toSet === want)
    assert(got.size === got.toSet.size, "a triangle was emitted twice")
    assert(want.nonEmpty, "test graph has no triangles — not a real check")
  }

  test("a planted 10³-degree hub generates no oriented wedges") {
    // hub id 0 (the id-order WORST case: every naive wedge keys on it)
    // with 1000 leaves, plus a few leaf-leaf edges forming triangles
    val hub = (1L to 1000L).map(l => (0L, l))
    val extra = Seq((1L, 2L), (2L, 3L), (1L, 3L), (5L, 6L))
    val df = (hub ++ extra).toDF("a", "b")
    val o = Graph.orientByDegree(df, "a", "b")
    val outdeg = o.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).as[Long].head()
    // naive id-order wedging would do C(1000,2) ≈ 5·10⁵ pairs on the hub
    // key; oriented, the hub's edges all point in and max outdeg is tiny
    assert(outdeg <= 4, s"max outdeg $outdeg — hub not oriented away")
    val tris = Graph.triangles(df, "a", "b").as[(Long, Long, Long)]
      .collect().toSet
    // each leaf-leaf edge closes a triangle through the hub, plus {1,2,3}
    assert(tris === Set((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L),
      (0L, 5L, 6L), (1L, 2L, 3L)))
  }

  test("salted wedge pairs spread a hub's quadratic over reducers") {
    // q193's shape: symmetric adjacency, pair generation keyed on center
    val hub = (1L to 400L).map(l => (0L, l))
    val sym = (hub ++ hub.map(_.swap)).toDF("src", "dst")
    val pairsDf = Skew.saltedSelfPairs(sym, "src", "dst", salts = 4)
      .select(col("a.dst").as("a"), col("b.dst").as("b"))
    val perPart = pairsDf.withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect()
    val total = perPart.map(_._2).sum
    assert(total === 400L * 399 / 2)
    // unsalted, the hub's C(400,2) pairs land in ONE task; salted over
    // 4²=16 buckets on 4 shuffle partitions no task may own the key
    assert(perPart.map(_._2).max < total / 2,
      s"hub pairs not spread: ${perPart.mkString(", ")}")
    // and the pair SET is unchanged (salting is a partitioning identity)
    val got = pairsDf.as[(Long, Long)].collect().toSet
    val want = (for (x <- 1L to 400L; y <- x + 1 to 400L) yield (x, y)).toSet
    assert(got === want)
  }
}
