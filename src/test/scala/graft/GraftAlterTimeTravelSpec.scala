package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, ManifestTable}

/** Round-10 DDL/time-travel closures: `ALTER TABLE ADD COLUMNS` as the
  * one safe alter (empty append carrying the extended schema; history
  * null-fills), and `TIMESTAMP AS OF` on commit times stamped inside
  * the manifest at CAS time (monotone per table; legacy unstamped
  * manifests refuse only when resolution needs them).
  */
class GraftAlterTimeTravelSpec extends SparkSpec {

  private def freshCat(cat: String): String = {
    val root = Files.createTempDirectory(s"graft_att_$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    root
  }

  test("ALTER TABLE ADD COLUMNS: null-fill, insert lands, rest refused") {
    val root = freshCat("attc")
    spark.sql("CREATE TABLE attc.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO attc.t VALUES (1, 'a'), (2, 'b')")

    spark.sql("ALTER TABLE attc.t ADD COLUMNS (note STRING, score DOUBLE)")
    // pre-alter commits null-fill the new columns
    val old = spark.sql("SELECT note, score FROM attc.t WHERE id = 1").head
    assert(old.isNullAt(0) && old.isNullAt(1))
    // an INSERT carrying the new columns lands against the extended schema
    spark.sql("INSERT INTO attc.t VALUES (3, 'c', 'fresh', 0.9)")
    val r3 = spark.sql("SELECT note, score FROM attc.t WHERE id = 3").head
    assert(r3.getString(0) == "fresh" && r3.getDouble(1) == 0.9)
    assert(spark.sql("SELECT count(*) FROM attc.t").head.getLong(0) == 3)
    // the alter is a real commit: pre-alter version still reads 2 columns
    assert(spark.sql("SELECT * FROM attc.t VERSION AS OF 2").columns.toSeq
      == Seq("id", "v"))

    // destructive / unsafe forms stay refused
    val drop = intercept[Exception](spark.sql("ALTER TABLE attc.t DROP COLUMN v"))
    assert(drop.getMessage.contains("refuses destructive DDL"), drop.getMessage)
    val ren = intercept[Exception](
      spark.sql("ALTER TABLE attc.t RENAME COLUMN v TO w"))
    assert(ren.getMessage.contains("refuses destructive DDL"), ren.getMessage)
    val retype = intercept[Exception](
      spark.sql("ALTER TABLE attc.t ALTER COLUMN id TYPE INT"))
    assert(retype.getMessage.contains("refuses destructive DDL") ||
      retype.getMessage.toLowerCase.contains("not supported"), retype.getMessage)
    val notNull = intercept[Exception](
      spark.sql("ALTER TABLE attc.t ADD COLUMNS (strict_col INT NOT NULL)"))
    assert(notNull.getMessage.contains("must be nullable"), notNull.getMessage)
    val positioned = intercept[Exception](
      spark.sql("ALTER TABLE attc.t ADD COLUMNS (early INT FIRST)"))
    assert(positioned.getMessage.contains("appends at the end"),
      positioned.getMessage)
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE attc.t ADD COLUMNS (NOTE STRING)"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    // nothing above landed a commit
    assert(spark.sql("SELECT count(*) FROM attc.t").head.getLong(0) == 3)
  }

  test("TIMESTAMP AS OF: stamped resolution, monotone, legacy refusal") {
    val root = freshCat("attt")
    val table = s"$root/t"
    import spark.implicits._
    ManifestTable.commit(Seq((1L, "a")).toDF("id", "v"), table, append = false)
    ManifestTable.commit(Seq((2L, "b")).toDF("id", "v"), table, append = true)
    ManifestTable.commit(Seq((3L, "c")).toDF("id", "v"), table, append = true)
    val ts = (1L to 3L).map(v =>
      ManifestTable.commitTimeMs(spark, table, v).get)
    // back-to-back commits in the same millisecond still stamp strictly
    // increasing times (max(now, prev+1))
    assert(ts == ts.sorted && ts.distinct.size == 3, ts.toString)

    def countAt(ms: Long): Long = spark.sql(
      s"SELECT count(*) FROM attt.t TIMESTAMP AS OF timestamp_millis($ms)")
      .head.getLong(0)
    assert(countAt(ts(0)) == 1, "exactly at v1's stamp -> v1")
    assert(countAt(ts(1) - 1) == 1, "between v1 and v2 -> v1")
    assert(countAt(ts(1)) == 2)
    assert(countAt(ts(2) + 60000) == 3, "after the head -> head")
    val early = intercept[Exception](countAt(ts(0) - 1))
    assert(early.getMessage.contains("before the earliest"), early.getMessage)

    // a pinned time-travel read is frozen: later commits don't leak in
    val pinned = spark.sql(
      s"SELECT max(id) FROM attt.t TIMESTAMP AS OF timestamp_millis(${ts(1)})")
    assert(pinned.head.getLong(0) == 2)

    // strip v1's stamp (legacy manifest): resolution that must inspect
    // it refuses; resolution satisfied above it still works
    val mPath = java.nio.file.Paths.get(s"$table/_manifests/m-000001.txt")
    val legacy = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
      .linesIterator.filterNot(_.startsWith("#ts:")).mkString("\n")
    java.nio.file.Files.write(mPath, legacy.getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$table/_manifests/.m-000001.txt.crc"))
    assert(countAt(ts(2)) == 3, "resolution above the legacy manifest works")
    val legacyRefuse = intercept[Exception](countAt(ts(1) - 1))
    assert(legacyRefuse.getMessage.contains("predates commit-time"),
      legacyRefuse.getMessage)

    // history reports the stamped times for stamped versions
    val hist = spark.sql("SELECT version, committed_at FROM attt.t.history")
      .collect()
    assert(hist.length == 3)
  }
}
