package graft

import graft.operators.Profiler

class ProfilerSpec extends SparkSpec {

  test("profile: nulls, exact distincts, and ranges in one aggregation pass") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.5), (2L, null), (2L, 7.5), (null, 2.5))
      .toDF("k", "v")
    val rows = Profiler.profile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows("k") == ((4L, 1L, 2L, 1.0, 2.0)), s"got ${rows("k")}")
    assert(rows("v") == ((4L, 1L, 2L, 2.5, 7.5)), s"got ${rows("v")}")
  }
}
