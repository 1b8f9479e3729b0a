package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, SkewJoin}

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, s"v$i"))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(large, small, "k", salt = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    assert(salted.count(_.contains("hot")) == 1800)
  }

  test("asof join picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 205L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "time", "tag")
    val right = Seq((1L, 90L, "c1"), (1L, 100L, "c2"), (1L, 201L, "c3"), (2L, 60L, "c4"))
      .toDF("k", "time", "click")
    val got = AsOfJoin.asof(left, right, "k", "time", "time", Seq("click"))
      .select(col("tag"), col("__match.click").as("click"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("p1").contains("c2")) // ties: right at equal time matches (<=)
    assert(got("p2").contains("c3")) // latest before 205
    assert(got("p3").isEmpty)        // right row is after left time → null
  }
}
