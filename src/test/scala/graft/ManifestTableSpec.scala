package graft

import java.nio.file.Files

import graft.sources.ManifestTable

class ManifestTableSpec extends SparkSpec {

  test("atomic commits, snapshot-pinned reads, compaction, and vacuum") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_manifest").toString + "/t"

    // v1: initial load
    val v1 = ManifestTable.commit(
      (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "v"), table, append = false)
    assert(v1 == 1 && ManifestTable.read(spark, table).count() == 100)

    // v2: append carries v1 forward
    val v2 = ManifestTable.commit(
      (101 to 150).map(i => (i.toLong, s"r$i")).toDF("id", "v"), table, append = true)
    assert(v2 == 2 && ManifestTable.read(spark, table).count() == 150)

    // v3: atomic overwrite; v2 stays pinned-readable (snapshot isolation)
    ManifestTable.commit(
      Seq((999L, "only")).toDF("id", "v"), table, append = false)
    assert(ManifestTable.read(spark, table).count() == 1)
    assert(ManifestTable.read(spark, table, version = 2).count() == 150,
      "pinned reader must keep its snapshot after an overwrite")

    // crash garbage is invisible: data without a manifest never surfaces
    (1 to 5).map(i => (-i.toLong, "orphan")).toDF("id", "v")
      .write.parquet(s"$table/data/deadbeefcafe0000")
    assert(ManifestTable.read(spark, table).count() == 1,
      "unmanifested data files must stay invisible")

    // compaction commits a new version with identical contents
    ManifestTable.commit(
      (1 to 60).map(i => (i.toLong, s"x$i")).toDF("id", "v").repartition(30),
      table, append = true)
    val before = ManifestTable.read(spark, table).count()
    val cv = ManifestTable.compactCommit(spark, table)
    assert(ManifestTable.currentVersion(spark, table) == cv)
    assert(ManifestTable.read(spark, table).count() == before,
      "compaction must not change the snapshot's contents")

    // vacuum keeps only the current version's dirs + drops old manifests
    ManifestTable.vacuum(spark, table, keepVersions = 1)
    assert(ManifestTable.read(spark, table).count() == before,
      "current snapshot survives vacuum")
    val e = intercept[Exception](
      ManifestTable.read(spark, table, version = 2).count())
    assert(e != null, "vacuumed snapshot is gone")

    // a LARGER retention after a stricter vacuum must skip the manifests
    // the stricter one already removed, not crash on them
    ManifestTable.commit(Seq((7L, "w")).toDF("id", "v"), table, append = true)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table, "_manifests", ".m-000099.txt.tmp-dead"),
      "garbage".getBytes)
    // graceMs = 0: the production default would (correctly) protect
    // just-written files as possible in-flight commits
    ManifestTable.vacuum(spark, table, keepVersions = 3, graceMs = 0L)
    assert(ManifestTable.read(spark, table).count() == before + 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(table, "_manifests", ".m-000099.txt.tmp-dead")),
      "crashed-publish temps must be swept")
  }
}
