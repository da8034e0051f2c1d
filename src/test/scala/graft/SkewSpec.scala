package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // one hot key owning 90% of the fact side
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val plain = big.join(small, "k").select($"k", $"v", $"name")
      .as[(Long, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select($"k", $"v", $"name").as[(Long, Int, String)].collect().toSet
    assert(salted === plain)
    assert(plain.count(_._1 == 7L) === 1800)
  }

  test("hotKeys surfaces the dominant key") {
    val big = (1 to 1000).map(i => (if (i % 5 == 0) i.toLong else 3L, i)).toDF("k", "v")
    val top = Skew.hotKeys(big, $"k", n = 1).as[(Long, Long)].head()
    assert(top === ((3L, 800L)))
  }
}
