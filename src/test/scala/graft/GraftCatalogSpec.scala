package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, ManifestTable}

/** The catalog layer over manifest tables: named SQL access, SHOW TABLES,
  * VERSION AS OF time travel, and the read-only contract.
  */
class GraftCatalogSpec extends SparkSpec {

  test("named tables, SHOW TABLES, VERSION AS OF, read-only contract") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_catalog").toString

    ManifestTable.commit(
      (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "v"),
      s"$root/postings", append = false, statsCols = Seq("id"))
    ManifestTable.commit(
      (101 to 150).map(i => (i.toLong, s"r$i")).toDF("id", "v"),
      s"$root/postings", append = true, statsCols = Seq("id"))
    ManifestTable.commit(
      Seq((1L, "x")).toDF("k", "w"),
      s"$root/dims", append = false)
    // a non-manifest dir under root must not list as a table
    Files.createDirectory(java.nio.file.Paths.get(root, "not_a_table"))

    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.root", root)

    // named access, current snapshot
    assert(spark.sql("SELECT count(*) AS n FROM graftcat.postings")
      .head.getLong(0) == 150)
    // predicate through the same pruning scan as format("graft")
    assert(spark.sql(
      "SELECT count(*) AS n FROM graftcat.postings WHERE id BETWEEN 40 AND 60")
      .head.getLong(0) == 21)

    // SQL time travel
    assert(spark.sql("SELECT count(*) AS n FROM graftcat.postings VERSION AS OF 1")
      .head.getLong(0) == 100)
    val missing = intercept[Exception](
      spark.sql("SELECT * FROM graftcat.postings VERSION AS OF 99").head)
    assert(missing.getMessage.contains("no version 99"), missing.getMessage)
    val ts = intercept[Exception](
      spark.sql(
        "SELECT * FROM graftcat.postings TIMESTAMP AS OF '2024-01-01'").head)
    assert(ts.getMessage.contains("VERSION AS OF"), ts.getMessage)

    // catalog listing: manifest tables only, sorted
    val listed = spark.sql("SHOW TABLES IN graftcat")
      .select("tableName").collect().map(_.getString(0)).toSeq
    assert(listed == Seq("dims", "postings"), listed.toString)

    // unknown table is a resolution error, not an empty frame
    val nope = intercept[Exception](
      spark.sql("SELECT * FROM graftcat.not_a_table").head)
    assert(nope.getMessage.toLowerCase.contains("table"), nope.getMessage)

    // containment: path-shaped names must not escape the catalog root
    val escape = intercept[Exception](
      spark.sql("SELECT * FROM graftcat.`../postings`").head)
    assert(escape.getMessage.contains("plain directory name"), escape.getMessage)

    // read-only: mutations route to ManifestTable, loudly
    val drop = intercept[Exception](spark.sql("DROP TABLE graftcat.dims"))
    assert(drop.getMessage.contains("read-only"), drop.getMessage)
    val create = intercept[Exception](
      spark.sql("CREATE TABLE graftcat.fresh (id BIGINT) USING graft"))
    assert(create.getMessage.contains("read-only"), create.getMessage)
  }
}
