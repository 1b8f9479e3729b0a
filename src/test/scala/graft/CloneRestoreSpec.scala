package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** SHALLOW CLONE + RESTORE — the zero-copy table ops (Delta semantics).
  * The properties that make them trustworthy: a clone moves no bytes and
  * evolves independently in BOTH directions; a restore preserves history
  * and re-pins the restored dirs against vacuum; incremental consumers
  * hit a loud boundary at a restore instead of double-reading.
  */
class CloneRestoreSpec extends SparkSpec {

  private def ids(table: String): Seq[Long] =
    ManifestTable.read(spark, table).select("id").collect()
      .map(_.getLong(0)).toSeq.sorted

  private def dataDirCount(table: String): Int = {
    val d = new java.io.File(table, "data")
    if (d.exists()) d.listFiles().count(_.isDirectory) else 0
  }

  test("shallow clone: zero bytes copied, stats carried, both sides evolve independently") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_clone").toString
    val src = s"$root/src"
    val tgt = s"$root/tgt"
    ManifestTable.commit((1L to 100L).toDF("id"), src, append = false,
      statsCols = Seq("id"))
    ManifestTable.commit((101L to 200L).toDF("id"), src, append = true,
      statsCols = Seq("id"))

    assert(ManifestTable.cloneShallow(spark, src, tgt) == 1L)
    assert(ids(tgt) == (1L to 200L), "clone reads the source snapshot")
    assert(dataDirCount(tgt) == 0, "a SHALLOW clone must move zero data bytes")
    // stats rode along: the pruned read returns only the FIRST commit's
    // rows (readRange prunes whole commits by [min,max]; the 101–200
    // commit is provably outside [1,50] and never scanned)
    assert(ManifestTable.readRange(spark, tgt, "id", "1", "50")
      .select("id").collect().map(_.getLong(0)).toSeq.sorted == (1L to 100L))

    // clone-side evolution never touches the source...
    ManifestTable.commit(Seq(999L).toDF("id"), tgt, append = true,
      statsCols = Seq("id"))
    assert(ids(tgt) == ((1L to 200L) :+ 999L) && ids(src) == (1L to 200L))
    // ...and source-side appends never leak into the clone's snapshot
    ManifestTable.commit(Seq(555L).toDF("id"), src, append = true,
      statsCols = Seq("id"))
    assert(!ids(tgt).contains(555L))

    // the clone's own vacuum must not reach the source's (absolute) dirs
    ManifestTable.vacuum(spark, tgt, keepVersions = 1, graceMs = 0L)
    assert(ids(tgt) == ((1L to 200L) :+ 999L),
      "clone vacuum deleted foreign dirs it does not own")
    assert(ids(src) == ((1L to 200L) :+ 555L))

    // deep-copy via compaction cuts the dependency: after it, deleting
    // the source entirely leaves the clone readable
    ManifestTable.compactCommit(spark, tgt)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    assert(ids(tgt) == ((1L to 200L) :+ 999L),
      "post-compaction clone must be self-contained")

    intercept[IllegalArgumentException](
      ManifestTable.cloneShallow(spark, tgt, tgt))
  }

  test("restore: rollback as a commit — history preserved, consumers hit a loud boundary") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_restore").toString
    val t = s"$root/t"
    ManifestTable.commit((1L to 10L).toDF("id"), t, append = false)   // v1
    ManifestTable.commit((11L to 20L).toDF("id"), t, append = true)   // v2
    ManifestTable.commit(Seq(77L).toDF("id"), t, append = false)      // v3 (bad overwrite)
    assert(ids(t) == Seq(77L))

    val v4 = ManifestTable.restore(spark, t, 1L)
    assert(v4 == 4L, "restore publishes a NEW version, it rewrites nothing")
    assert(ids(t) == (1L to 10L), "head reads the restored snapshot")
    // history stays addressable for forensics/time travel
    assert(ManifestTable.read(spark, t, version = 2L).count() == 20L)
    assert(ManifestTable.read(spark, t, version = 3L).count() == 1L)

    // a consumer that tailed through v2 must fail LOUDLY across the
    // restore (v2's appended dirs are gone from the head — silent
    // success would double-read everything it already consumed)
    intercept[IllegalArgumentException] {
      ManifestTable.readAppendedSince(spark, t, fromVersion = 2L).count()
    }

    // restore re-pins v1's dirs at the head: vacuum keeping only the
    // head must preserve them
    ManifestTable.vacuum(spark, t, keepVersions = 1, graceMs = 0L)
    assert(ids(t) == (1L to 10L), "vacuum after restore must keep the restored dirs")

    intercept[IllegalArgumentException](ManifestTable.restore(spark, t, 99L))
  }
}
