package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.io.Source

import org.apache.hadoop.fs.Path
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

  private def writeFile(spark: SparkSession, p: Path, content: String): Unit = {
    val f = fs(spark, p)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    f.delete(p, false)
    require(f.rename(tmp, p), s"manifest-table: could not publish $p")
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
    * the new data the entire snapshot (atomic overwrite).
    */
  def commit(df: DataFrame, table: String, append: Boolean): Long = {
    val spark = df.sparkSession
    val v = currentVersion(spark, table)
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
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    commit(read(spark, table, v).repartition(nFiles), table, append = false)
  }

  /** Delete data dirs no version ≥ (current - keepVersions + 1) references,
    * and their superseded manifests. Run once readers of old snapshots
    * are done — the same retention contract as any table format.
    */
  def vacuum(spark: SparkSession, table: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1)
    val v = currentVersion(spark, table)
    if (v == 0) return
    val keepFrom = math.max(1L, v - keepVersions + 1)
    val live = (keepFrom to v).flatMap(dataDirs(spark, table, _)).toSet
    val root = new Path(table)
    val f = fs(spark, root)
    val dataRoot = new Path(root, "data")
    if (f.exists(dataRoot))
      f.listStatus(dataRoot)
        .filter(st => !live.contains(s"data/${st.getPath.getName}"))
        .foreach(st => f.delete(st.getPath, true))
    (1L until keepFrom).foreach(old => f.delete(manifestPath(table, old), false))
  }
}
