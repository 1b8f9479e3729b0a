package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.io.Source

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal manifest-pinned table: atomic commits and snapshot-isolated
  * reads over plain parquet — the table-format pattern (Iceberg/Delta's
  * core idea) at the scale of this engine. The physical contract:
  *
  *   table/
  *     data/<uuid>/part-*.parquet     one directory per commit
  *     _manifests/m-<version>.txt     sorted data-dir list per version
  *     _latest                        pointer file: current version
  *
  * Data lands FIRST, the manifest names it, and the `_latest` pointer
  * flips LAST via a same-directory temp-file rename — so a reader either
  * sees the previous complete snapshot or the new one, never a partial
  * write, and a crash at any point leaves only invisible garbage (data
  * without a manifest / manifest without the pointer), never a broken
  * table. Readers that pin a version keep a consistent snapshot while
  * writers commit ahead; [[vacuum]] reclaims superseded commits once no
  * reader needs them.
  *
  * This also closes [[ParquetSink.compact]]'s documented reader-retry
  * window: [[compactCommit]] rewrites the current snapshot and swaps the
  * pointer with zero reader-visible downtime.
  *
  * Single-writer contract (like every pointer-swap table format without
  * a lock service): serialize commits per table — BatchRunner's ledger
  * is the natural way.
  */
object ManifestTable {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic publish: write a temp sibling, then ONE overwriting rename
    * (FileContext.rename(OVERWRITE) — atomic on HDFS and local). A
    * delete-then-rename pair would open a window where `_latest` does
    * not exist at all: readers would see "no committed version" and a
    * writer crash inside the window would fork the version timeline.
    */
  private def writeFile(spark: SparkSession, p: Path, content: String): Unit = {
    val f = fs(spark, p)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val fc = FileContext.getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  private def readFile(spark: SparkSession, p: Path): String = {
    val in = fs(spark, p).open(p)
    try Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
  }

  /** Current committed version, or 0 if the table is empty/uninitialized. */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val ptr = new Path(table, "_latest")
    if (fs(spark, ptr).exists(ptr)) readFile(spark, ptr).toLong else 0L
  }

  private def manifestPath(table: String, v: Long) =
    new Path(table, f"_manifests/m-$v%06d.txt")

  private def dataDirs(spark: SparkSession, table: String, v: Long): Seq[String] =
    if (v == 0) Nil
    else readFile(spark, manifestPath(table, v)).linesIterator
      .map(_.trim).filter(_.nonEmpty).toSeq

  /** Commit `df` as the next version. `append = true` carries the current
    * snapshot's data dirs forward into the new manifest; `false` makes
    * the new data the entire snapshot (atomic overwrite). Appends must
    * match the current snapshot's schema (names + types) — a drifted
    * append fails HERE, at the write that caused it, instead of
    * poisoning arbitrary later reads with footer-sampling surprises.
    */
  def commit(df: DataFrame, table: String, append: Boolean): Long = {
    val spark = df.sparkSession
    val v = currentVersion(spark, table)
    if (append && v > 0) {
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(f => (f.name, f.dataType)).toSeq
      val current = read(spark, table, v).schema
      require(shape(df.schema) == shape(current),
        s"manifest-table: append schema ${df.schema.simpleString} does not " +
          s"match the snapshot's ${current.simpleString}")
    }
    val dirName = s"data/${UUID.randomUUID().toString.replace("-", "").take(16)}"
    df.write.parquet(new Path(table, dirName).toString)
    val dirs = (if (append) dataDirs(spark, table, v) else Nil) :+ dirName
    writeFile(spark, manifestPath(table, v + 1), dirs.sorted.mkString("\n"))
    writeFile(spark, new Path(table, "_latest"), (v + 1).toString)
    v + 1
  }

  /** Read a snapshot: the current one, or a pinned `version` for
    * time-travel / long-running-job consistency.
    */
  def read(spark: SparkSession, table: String, version: Long = 0L): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, table)
    require(v > 0, s"manifest-table: $table has no committed version")
    val paths = dataDirs(spark, table, v).map(d => new Path(table, d).toString)
    spark.read.parquet(paths: _*)
  }

  /** Rewrite the current snapshot into ~targetBytes files and commit the
    * result as a new version — compaction with zero reader-visible
    * downtime (old snapshot stays pinned-readable until vacuumed).
    */
  def compactCommit(spark: SparkSession, table: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val v = currentVersion(spark, table)
    require(v > 0, s"manifest-table: $table has no committed version")
    val root = new Path(table)
    val f = fs(spark, root)
    val bytes = dataDirs(spark, table, v)
      .map(d => f.getContentSummary(new Path(root, d)).getLength).sum
    val nFiles = ParquetSink.targetFileCount(bytes, targetBytes)
    commit(read(spark, table, v).repartition(nFiles), table, append = false)
  }

  /** Delete data dirs no version ≥ (current - keepVersions + 1) references,
    * superseded manifests, and crashed-publish temp files. Run once
    * readers of old snapshots are done — the same retention contract as
    * any table format. Manifests a stricter earlier vacuum already
    * removed are skipped, and deletions are driven by a directory
    * listing, so a vacuum's cost tracks actual garbage, not the
    * table's age.
    *
    * Safe alongside an IN-FLIGHT commit: manifests numbered past the
    * current pointer are treated as live (a writer mid-publish), and
    * unmanifested data dirs / temp files are only reclaimed once older
    * than `graceMs` — a data dir younger than that may simply not have
    * its manifest yet (the Delta/Iceberg retention pattern). Keep
    * graceMs comfortably above the longest commit's write time.
    */
  def vacuum(spark: SparkSession, table: String, keepVersions: Int = 1,
      graceMs: Long = 60L * 60 * 1000): Unit = {
    require(keepVersions >= 1)
    val v = currentVersion(spark, table)
    if (v == 0) return
    val keepFrom = math.max(1L, v - keepVersions + 1)
    val root = new Path(table)
    val f = fs(spark, root)
    val cutoff = System.currentTimeMillis() - graceMs
    val manifestRoot = new Path(root, "_manifests")
    val manifestVers: Seq[Long] =
      if (f.exists(manifestRoot))
        f.listStatus(manifestRoot).toSeq.flatMap(st =>
          Option(st.getPath.getName)
            .filter(n => n.startsWith("m-") && n.endsWith(".txt"))
            .flatMap(_.stripPrefix("m-").stripSuffix(".txt").toLongOption))
      else Nil
    // live = everything the retained versions reference PLUS anything an
    // in-flight (not-yet-pointed) manifest references
    val live = manifestVers.filter(_ >= keepFrom)
      .flatMap(dataDirs(spark, table, _)).toSet
    val dataRoot = new Path(root, "data")
    if (f.exists(dataRoot))
      f.listStatus(dataRoot)
        .filter(st => !live.contains(s"data/${st.getPath.getName}"))
        .filter(_.getModificationTime < cutoff)
        .foreach(st => f.delete(st.getPath, true))
    if (f.exists(manifestRoot))
      f.listStatus(manifestRoot).foreach { st =>
        val name = st.getPath.getName
        val superseded = name.startsWith("m-") &&
          name.stripPrefix("m-").stripSuffix(".txt").toLongOption.exists(_ < keepFrom)
        val staleTmp = name.contains(".tmp-") && st.getModificationTime < cutoff
        if (superseded || staleTmp) f.delete(st.getPath, false)
      }
    // crashed _latest publishes leave temps in the table root
    f.listStatus(root)
      .filter(st => st.getPath.getName.contains(".tmp-") &&
        st.getModificationTime < cutoff)
      .foreach(st => f.delete(st.getPath, false))
  }
}
