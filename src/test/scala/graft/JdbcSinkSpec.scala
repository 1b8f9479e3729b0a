package graft

import java.sql.DriverManager

import graft.sources.JdbcSink

class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def count(where: String = ""): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM mart $where")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("idempotent overwrite-by-partition load with COPY-style batching") {
    import spark.implicits._
    System.setProperty("derby.system.home", "/tmp/derby")
    val c = DriverManager.getConnection(url)
    c.createStatement().execute(
      "CREATE TABLE mart (part VARCHAR(10) NOT NULL, id BIGINT, metric DOUBLE)")
    c.close()

    val df = (1 to 10).map(i => (if (i <= 6) "a" else "b", i.toLong, i * 1.5))
      .toDF("part", "id", "metric").coalesce(1)
    val s1 = JdbcSink.writePartitioned(df, url, "mart", "part", batchSize = 3)
    // one spark partition, 10 rows, batchSize 3 -> exactly ceil(10/3) batches
    assert(s1 == JdbcSink.WriteStats(10, 4), s"stats $s1")
    assert(count() == 10)

    // re-running the identical load must not duplicate anything
    val s2 = JdbcSink.writePartitioned(df, url, "mart", "part", batchSize = 3)
    assert(s2.rows == 10 && count() == 10, "reload must be idempotent")

    // partial reload: partition a replaced wholesale, partition b untouched
    val dfA = Seq(("a", 100L, 9.9)).toDF("part", "id", "metric")
    JdbcSink.writePartitioned(dfA, url, "mart", "part")
    assert(count("WHERE part = 'a'") == 1, "partition a must be overwritten")
    assert(count("WHERE part = 'b'") == 4, "partition b must be untouched")
  }

  test("JdbcSource reads the served mart back as a partitioned scan") {
    // runs after the load test populated `mart` (ScalaTest executes in
    // declaration order within a suite)
    val back = graft.sources.JdbcSource.read(spark, url, "mart", "id",
      numPartitions = 3)
    assert(back.rdd.getNumPartitions == 3, "scan must fan out across slices")
    val rows = back.collect().map(r =>
      (r.getAs[String]("PART"), r.getAs[Long]("ID"), r.getAs[Double]("METRIC"))).toSet
    // state after the load test: partition a overwritten with one row,
    // partition b holding its original four
    assert(rows.size == 5 && rows.contains(("a", 100L, 9.9)), rows.toString)
    assert(rows.count(_._1 == "b") == 4)
  }

  test("merge keeps only the winning attempt per partition") {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE mart2 (part VARCHAR(10), id BIGINT, metric DOUBLE)")
      st.execute("CREATE TABLE mart2_stage (part VARCHAR(10), id BIGINT, " +
        "metric DOUBLE, gstg_part INTEGER, gstg_att BIGINT)")
      // partition 0 committed TWICE (a speculative race that both won the
      // stage commit): identical content under attempt ids 7 and 9
      st.execute("INSERT INTO mart2_stage VALUES ('a', 1, 1.0, 0, 7)")
      st.execute("INSERT INTO mart2_stage VALUES ('a', 1, 1.0, 0, 9)")
      st.execute("INSERT INTO mart2_stage VALUES ('b', 2, 2.0, 1, 8)")
    } finally c.close()

    val stats = JdbcSink.mergeStage(url, "mart2", "mart2_stage", "part",
      Seq("part", "id", "metric"))
    assert(stats.rows == 2, "only the winning attempt's rows merge")
    assert(stats.batches == 2, "batch stats count winning attempts only")
    val c2 = DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery("SELECT COUNT(*) FROM mart2")
      rs.next(); assert(rs.getLong(1) == 2, "no duplicate from the losing attempt")
    } finally c2.close()
  }
}
