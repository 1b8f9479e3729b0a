package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, GraftDataSource, ManifestTable}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** DELETE FROM: metadata-FIRST — drop whole commits when stats prove
  * every row matches, carry provably-disjoint commits by reference —
  * with a copy-on-write fallback for straddling commits when the
  * predicate translates exactly to a row filter (round 10; the spec
  * that decidable dirs NEVER rewrite lives in GraftDmlSpec).
  */
class GraftDeleteSpec extends SparkSpec {
  import ManifestTable.{ColStat, Entry}

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("entryAllMatch: strictness, null gates, Not duality, In") {
    def stat(mn: Long, mx: Long, nulls: Option[Long]) =
      Entry("data/d", Map("id" -> ColStat("num", mn.toString, mx.toString, nulls)))
    val clean = stat(10, 20, Some(0L))

    // range proofs honor strictness exactly at the boundary
    assert(GraftDataSource.entryAllMatch(schema, clean, GreaterThanOrEqual("id", 10L)))
    assert(!GraftDataSource.entryAllMatch(schema, clean, GreaterThan("id", 10L)),
      "min == strict bound: some row may equal it")
    assert(GraftDataSource.entryAllMatch(schema, clean, GreaterThan("id", 9L)))
    assert(GraftDataSource.entryAllMatch(schema, clean, LessThanOrEqual("id", 20L)))
    assert(!GraftDataSource.entryAllMatch(schema, clean, LessThan("id", 20L)))

    // any null row breaks every proof (a NULL predicate row is not
    // deleted, so dropping its dir would over-delete)
    val withNulls = stat(10, 20, Some(3L))
    assert(!GraftDataSource.entryAllMatch(schema, withNulls,
      GreaterThanOrEqual("id", 0L)))
    assert(GraftDataSource.entryAllMatch(schema, clean, IsNotNull("id")))
    assert(!GraftDataSource.entryAllMatch(schema, withNulls, IsNotNull("id")))

    // legacy entries (no null count) never prove
    val legacy = stat(10, 20, None)
    assert(!GraftDataSource.entryAllMatch(schema, legacy,
      GreaterThanOrEqual("id", 0L)))

    // Not: all rows match ¬p iff no row CAN match p and p never
    // evaluates NULL
    assert(GraftDataSource.entryAllMatch(schema, clean,
      Not(GreaterThan("id", 100L))))
    assert(!GraftDataSource.entryAllMatch(schema, withNulls,
      Not(GreaterThan("id", 100L))))
    assert(!GraftDataSource.entryAllMatch(schema, clean,
      Not(GreaterThan("id", 15L))), "some rows could match the inner pred")

    // In: provable exactly for single-valued dirs
    val single = stat(7, 7, Some(0L))
    assert(GraftDataSource.entryAllMatch(schema, single, In("id", Array(7L, 9L))))
    assert(!GraftDataSource.entryAllMatch(schema, clean, In("id", Array(10L, 20L))))

    // conjunction/disjunction compose
    assert(GraftDataSource.entryAllMatch(schema, clean,
      And(GreaterThanOrEqual("id", 10L), LessThanOrEqual("id", 20L))))
    assert(GraftDataSource.entryAllMatch(schema, clean,
      Or(GreaterThan("id", 50L), LessThanOrEqual("id", 20L))))
  }

  test("IsNull pruning rides the recorded null count; unborn tables refuse DELETE at analysis") {
    def stat(nulls: Option[Long]) =
      Entry("data/d", Map("id" -> ColStat("num", "10", "20", nulls)))
    // zero recorded nulls: IS NULL provably matches nothing — the scan
    // prunes the dir and a DELETE WHERE id IS NULL classifies it
    // CowKeep instead of rewriting the whole table to delete nothing
    assert(!GraftDataSource.entryCanMatch(schema, stat(Some(0L)), IsNull("id")))
    assert(!GraftDataSource.entryCanMatch(schema, stat(Some(0L)),
      EqualNullSafe("id", null)))
    // positive or unrecorded null counts stay conservative
    assert(GraftDataSource.entryCanMatch(schema, stat(Some(3L)), IsNull("id")))
    assert(GraftDataSource.entryCanMatch(schema, stat(None), IsNull("id")))
    // the all-match dual still refuses (there is no all-null proof)
    assert(!GraftDataSource.entryAllMatch(schema, stat(Some(0L)), IsNull("id")))
    // unborn table: nothing to delete, no schema to prove against —
    // analysis-time refusal, not an execution-time internal require
    val unborn = GraftDataSource.GraftTable(
      java.nio.file.Files.createTempDirectory("graft_unborn").toString + "/t", 0L)
    assert(!unborn.canDeleteWhere(Array[Filter](EqualTo("id", 1L))))
  }

  test("DELETE FROM: metadata-only retention, refusals, truncate, rebirth") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_delete").toString
    spark.conf.set("spark.sql.catalog.delcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.delcat.root", root)
    val table = s"$root/t"

    // two key-split commits with id stats (null counts recorded)
    ManifestTable.commit((1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      table, append = false, statsCols = Seq("id"))
    ManifestTable.commit((101 to 150).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
      table, append = true, statsCols = Seq("id"))
    val dirsBefore = ManifestTable.manifestEntries(spark, table, 2L).map(_.dir)

    // retention: the predicate covers commit 1 exactly -> dropped from
    // the snapshot, zero bytes moved
    spark.sql("DELETE FROM delcat.t WHERE id <= 100")
    assert(spark.sql("SELECT count(*) FROM delcat.t").head.getLong(0) == 50)
    assert(ManifestTable.currentVersion(spark, table) == 3L)
    // history intact: the pre-delete snapshot still reads in full
    assert(spark.sql("SELECT count(*) FROM delcat.t VERSION AS OF 2")
      .head.getLong(0) == 150)
    // metadata-only: the dropped dir's files are untouched on disk
    val dropped = dirsBefore.diff(
      ManifestTable.manifestEntries(spark, table, 3L).map(_.dir))
    assert(dropped.size == 1)
    assert(new java.io.File(s"$table/${dropped.head}").listFiles()
      .exists(_.getName.endsWith(".parquet")),
      "metadata delete must not destroy data (vacuum reclaims it)")

    // a straddling predicate copy-on-write rewrites the undecidable
    // commit minus its matching rows (pre-r10 this refused)
    spark.sql("DELETE FROM delcat.t WHERE id <= 120")
    assert(spark.sql("SELECT count(*) FROM delcat.t").head.getLong(0) == 30)
    assert(spark.sql("SELECT min(id) FROM delcat.t").head.getLong(0) == 121)

    // null rows survive row-level deletes: min/max-based proofs ignore
    // them, and the rewrite's gate only removes TRUE-predicate rows
    val t2 = s"$root/t2"
    ManifestTable.commit(
      Seq((Some(1L), "a"), (Some(2L), "b"), (Option.empty[Long], "n"))
        .toDF("id", "v"),
      t2, append = false, statsCols = Seq("id"))
    spark.sql("DELETE FROM delcat.t2 WHERE id <= 100")
    val t2rows = spark.sql("SELECT v FROM delcat.t2").collect().map(_.getString(0))
    assert(t2rows.toSeq == Seq("n"),
      s"only the null-id row survives: ${t2rows.toSeq}")

    // delete-all empties the snapshot but keeps the schema: the table
    // stays INSERTable (rebirth)
    spark.sql("DELETE FROM delcat.t")
    assert(spark.sql("SELECT count(*) FROM delcat.t").head.getLong(0) == 0)
    spark.sql("INSERT INTO delcat.t VALUES (9, 'z')")
    assert(spark.sql("SELECT v FROM delcat.t").head.getString(0) == "z")

    // TRUNCATE TABLE: same contract through Spark's own statement
    spark.sql("TRUNCATE TABLE delcat.t")
    assert(spark.sql("SELECT count(*) FROM delcat.t").head.getLong(0) == 0)

    // the full retention story: the delete dropped the commit from the
    // snapshot, vacuum reclaims its BYTES once no retained version
    // references it (grace 0 here; production keeps the reader grace)
    val t1dropped = s"$table/${dropped.head}"
    assert(new java.io.File(t1dropped).exists())
    ManifestTable.vacuum(spark, table, keepVersions = 1, graceMs = 0L)
    assert(!new java.io.File(t1dropped).exists(),
      "vacuum must reclaim the delete-dropped dir")
    assert(spark.sql("SELECT count(*) FROM delcat.t").head.getLong(0) == 0,
      "the post-delete head stays readable after vacuum")

    // NTZ timestamps (what parquet timestamp columns load as) carry
    // their own stats tag: wall-time canonical strings, recorded
    // session-independently - the event-time retention case
    val t4 = s"$root/t4"
    val ev = (1 to 10).map(i => (i.toLong, f"200${i / 6}-01-0${i % 5 + 1} 10:30:00"))
      .toDF("id", "ts_raw")
      .withColumn("ts", col("ts_raw").cast("timestamp_ntz")).drop("ts_raw")
    ManifestTable.commit(ev.filter(col("ts") < lit("2001-01-01")),
      t4, append = false, statsCols = Seq("ts"))
    ManifestTable.commit(ev.filter(col("ts") >= lit("2001-01-01")),
      t4, append = true, statsCols = Seq("ts"))
    assert(ManifestTable.manifestEntries(spark, t4, 2L)
      .forall(e => e.stats.get("ts").exists(_.tag == "tsn")),
      "NTZ columns must record tsn stats")
    spark.sql("DELETE FROM delcat.t4 WHERE ts <= '2000-12-31 23:59:59'")
    assert(spark.sql("SELECT count(*) FROM delcat.t4").head.getLong(0) == 5)
    // and the pruned range read shares the comparison
    assert(ManifestTable.readRange(spark, t4, "ts",
      "2001-01-01", "2002-01-01").count() == 5)

    // legacy manifest entries (pre-null-count format) never PROVE — the
    // delete must take the copy-on-write path, not the metadata drop:
    // strip the nulls field from the live manifest and try the delete
    val t3 = s"$root/t3"
    ManifestTable.commit((1 to 10).map(i => (i.toLong, "x")).toDF("id", "v"),
      t3, append = false, statsCols = Seq("id"))
    val mPath = java.nio.file.Paths.get(s"$t3/_manifests/m-000001.txt")
    val legacyLine = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
      .split("\t").toList match {
        case dir :: stats :: Nil =>
          dir + "\t" + stats.split(';').map(p =>
            p.split(":", -1).take(4).mkString(":")).mkString(";")
        case other => fail(s"unexpected manifest shape: $other")
      }
    java.nio.file.Files.write(mPath, legacyLine.getBytes("UTF-8"))
    // the raw rewrite invalidates the local-fs checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$t3/_manifests/.m-000001.txt.crc"))
    val legacyDirs = ManifestTable.manifestEntries(spark, t3, 1L).map(_.dir)
    spark.sql("DELETE FROM delcat.t3 WHERE id <= 5")
    assert(spark.sql("SELECT count(*) FROM delcat.t3").head.getLong(0) == 5)
    assert(!ManifestTable.manifestEntries(spark, t3,
      ManifestTable.currentVersion(spark, t3)).map(_.dir)
      .exists(legacyDirs.contains),
      "a legacy entry cannot prove, so it must rewrite, never drop blind")
  }
}
