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
    // TIMESTAMP AS OF resolves on stamped commit times (r10): a target
    // before the table existed fails loudly, the head's stamp resolves
    // to the head (full travel matrix in GraftAlterTimeTravelSpec)
    val ts = intercept[Exception](
      spark.sql(
        "SELECT * FROM graftcat.postings TIMESTAMP AS OF '2024-01-01'").head)
    assert(ts.getMessage.contains("before the earliest"), ts.getMessage)
    val headMs = graft.sources.ManifestTable.commitTimeMs(spark,
      s"$root/postings",
      graft.sources.ManifestTable.currentVersion(spark, s"$root/postings")).get
    assert(spark.sql("SELECT count(*) FROM graftcat.postings " +
      s"TIMESTAMP AS OF timestamp_millis($headMs)").head.getLong(0) == 150)

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

    // a NESTED namespace is TABLE_OR_VIEW_NOT_FOUND (what identifier-
    // probing tools expect), not a bare require failure
    val nested = intercept[Exception](
      spark.sql("SELECT * FROM graftcat.a.b.postings").head)
    assert(nested.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      nested.getMessage.toLowerCase.contains("cannot be found"),
      nested.getMessage)

    // destructive DDL: refused, routed to ManifestTable loudly
    val drop = intercept[Exception](spark.sql("DROP TABLE graftcat.dims"))
    assert(drop.getMessage.contains("destructive DDL"), drop.getMessage)
    // ALTER ADD COLUMNS is the ONE accepted alter (r10 — additive, safe
    // commit form; full matrix in GraftAlterTimeTravelSpec). Destructive
    // alters still refuse.
    spark.sql("ALTER TABLE graftcat.dims ADD COLUMN extra BIGINT")
    assert(spark.table("graftcat.dims").columns.contains("extra"))
    val alterDrop = intercept[Exception](
      spark.sql("ALTER TABLE graftcat.dims DROP COLUMN w"))
    assert(alterDrop.getMessage.contains("destructive DDL"),
      alterDrop.getMessage)
  }

  test("SQL DML: CREATE TABLE, INSERT INTO/OVERWRITE, CTAS land as CAS commits") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_catalog_dml").toString
    spark.conf.set("spark.sql.catalog.dml", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dml.root", root)

    // CREATE TABLE births an empty v1 commit with the DDL schema
    spark.sql("CREATE TABLE dml.jobs (id BIGINT, title STRING)")
    assert(ManifestTable.currentVersion(spark, s"$root/jobs") == 1L)
    assert(spark.sql("SELECT count(*) AS n FROM dml.jobs").head.getLong(0) == 0)
    val dup = intercept[Exception](spark.sql("CREATE TABLE dml.jobs (id BIGINT)"))
    assert(dup.getMessage.toUpperCase.contains("ALREADY EXISTS"), dup.getMessage)

    // INSERT INTO = CAS append: version advances, rows accumulate
    spark.sql("INSERT INTO dml.jobs VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO dml.jobs VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) AS n FROM dml.jobs").head.getLong(0) == 3)
    assert(ManifestTable.currentVersion(spark, s"$root/jobs") == 3L)
    // time travel sees the pre-insert snapshots intact
    assert(spark.sql("SELECT count(*) AS n FROM dml.jobs VERSION AS OF 2")
      .head.getLong(0) == 2)

    // INSERT OVERWRITE = atomic whole-snapshot replace
    spark.sql("INSERT OVERWRITE dml.jobs VALUES (9, 'z')")
    assert(spark.sql("SELECT id FROM dml.jobs").collect().map(_.getLong(0)).toSeq
      == Seq(9L))
    assert(spark.sql("SELECT count(*) AS n FROM dml.jobs VERSION AS OF 3")
      .head.getLong(0) == 3) // overwrite rewrote the head, not history

    // CTAS: create + append in one statement
    spark.sql("CREATE TABLE dml.titles AS SELECT title FROM dml.jobs")
    assert(spark.sql("SELECT title FROM dml.titles").head.getString(0) == "z")

    // a time-travel view is not a write target
    val pinned = intercept[Exception](
      spark.sql("INSERT INTO dml.jobs VERSION AS OF 2 VALUES (7, 'x')"))
    assert(pinned.getMessage.contains("time-travel") ||
      pinned.getMessage.toLowerCase.contains("syntax"), pinned.getMessage)

    // INSERT aligns to the table schema: a shape mismatch fails loudly
    val drift = intercept[Exception](
      spark.sql("INSERT INTO dml.jobs VALUES (1, 'a', 99)"))
    assert(drift.getMessage.toLowerCase.contains("column"), drift.getMessage)

    // a foreign USING format is refused, not silently reinterpreted
    val foreign = intercept[Exception](
      spark.sql("CREATE TABLE dml.alien (id BIGINT) USING parquet"))
    assert(foreign.getMessage.contains("USING parquet is not"),
      foreign.getMessage)

    // LOCATION is refused loudly - silently creating the table under
    // the catalog root while the user believes it lives elsewhere is
    // the wrong-location trap (r15 review)
    val loc = intercept[Exception](spark.sql(
      "CREATE TABLE dml.elsewhere (id BIGINT) LOCATION '/data/elsewhere'"))
    assert(loc.getMessage.contains("LOCATION"), loc.getMessage)

    // intra-statement duplicate ADD COLUMNS refuses clearly: Spark 4's
    // analyzer catches the SQL route (COLUMN_ALREADY_EXISTS); the
    // catalog's own "more than once" require guards direct alterTable
    // API calls the analyzer never sees
    val dupCol = intercept[Exception](spark.sql(
      "ALTER TABLE dml.jobs ADD COLUMNS (x INT, x STRING)"))
    assert(dupCol.getMessage.contains("COLUMN_ALREADY_EXISTS") ||
      dupCol.getMessage.contains("more than once"), dupCol.getMessage)

    // the version ledger: VERSION AS OF made discoverable from SQL
    // (jobs went CREATE -> INSERT -> INSERT -> OVERWRITE = v1..v4)
    val hist = spark.sql(
      "SELECT version, n_dirs, added_dirs, removed_dirs " +
        "FROM dml.jobs.history ORDER BY version").collect()
    assert(hist.map(_.getLong(0)).toSeq == (1L to 4L), hist.mkString(","))
    assert(hist.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 1), "snapshot dir counts")
    val overwrite = hist.last
    assert(overwrite.getInt(2) == 1 && overwrite.getInt(3) == 3,
      s"the overwrite must read as +1/-3 dirs: $overwrite")
    assert(spark.sql("SELECT committed_at FROM dml.jobs.history")
      .collect().forall(!_.isNullAt(0)), "landing times reported")
    // same ledger through the path-based option form
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW jobs_hist USING graft " +
      s"OPTIONS (path '$root/jobs', history 'true')")
    assert(spark.sql("SELECT count(*) FROM jobs_hist").head.getLong(0) == 4)
  }
}
