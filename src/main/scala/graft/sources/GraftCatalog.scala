package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark catalog over a directory of [[ManifestTable]]s, completing the
  * pure-SQL lakehouse surface the `graft` data source opened: tables get
  * NAMES (no paths in queries), `SHOW TABLES` lists them, and Spark's own
  * time-travel syntax works —
  *
  * {{{
  *   spark.sql.catalog.jobs      = graft.sources.GraftCatalog
  *   spark.sql.catalog.jobs.root = /warehouse/graft
  *
  *   SELECT * FROM jobs.postings                       -- current snapshot
  *   SELECT * FROM jobs.postings VERSION AS OF 3       -- time travel
  *   SHOW TABLES IN jobs
  * }}}
  *
  * A table is any direct child directory of `root` holding a
  * `_manifests` dir (i.e. anything [[ManifestTable.commit]] has ever
  * published). The namespace is flat by design — the reference's
  * warehouse is one schema of a handful of tables, and nesting would
  * only add path-mangling surface.
  *
  * DML writes work — `INSERT INTO` / `INSERT OVERWRITE` route through
  * the loaded table's write builder onto [[ManifestTable.commit]] (CAS
  * append / atomic overwrite), and `CREATE TABLE` (incl. CTAS) bootstraps
  * a table as an empty first commit — because each maps 1:1 onto a
  * commit form. The DESTRUCTIVE DDL does not and stays refused:
  * a SQL `DROP TABLE` that rm -rf'd a manifest table would bypass the
  * CAS discipline (and the vacuum grace) that makes concurrent readers
  * safe, `ALTER` would mutate immutable manifests, and `RENAME` would
  * yank the path out from under pinned readers. Those go through
  * [[ManifestTable]] entry points, where their semantics are explicit.
  * Loaded tables are [[GraftDataSource.GraftTable]]s, so scans get the
  * same stats pruning and V1-bridge execution as `format("graft")`.
  */
final class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).map(_.trim).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"graft catalog '$name': set spark.sql.catalog.$name.root to the " +
          "directory holding the manifest tables"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def tablePath(ident: Identifier): String = {
    // flat namespace: permit both `jobs.t` (namespace []) and the
    // session-default-database form `jobs.default.t` some tools emit
    val ns = ident.namespace()
    require(ns.isEmpty || ns.sameElements(Array("default")),
      s"graft catalog: flat namespace, got ${ns.mkString(".")}")
    // containment: a table IS a direct child dir of root — a backticked
    // name like `../elsewhere/t` or `a/b` would escape the catalog root
    // (reading tables SHOW TABLES never lists and the operator never
    // granted); path-shaped names fail here, loudly
    val n = ident.name()
    require(n.nonEmpty && !n.contains('/') && !n.contains('\\') &&
      n != "." && n != "..",
      s"graft catalog: table name '$n' must be a plain directory name")
    new Path(root, n).toString
  }

  private def isManifestTable(path: String): Boolean =
    // routed through the commit store, so discovery agrees with whatever
    // store published the manifests (object-store mode included)
    ManifestTable.isTable(spark, path)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!(namespace.isEmpty || namespace.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(rootPath)) return Array.empty
    f.listStatus(rootPath)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isManifestTable(new Path(root, n).toString))
      .sorted
      .map(n => Identifier.of(Array.empty, n))
  }

  override def tableExists(ident: Identifier): Boolean =
    try isManifestTable(tablePath(ident))
    catch { case _: IllegalArgumentException => false }

  override def loadTable(ident: Identifier): Table = {
    // `SELECT * FROM cat.t.history` (the Iceberg metadata-table idiom)
    // arrives as Identifier(namespace = [t], name = "history"): the
    // version ledger that makes VERSION AS OF discoverable from SQL.
    // Precedence: the documented default-database form (`cat.default.h`
    // = TABLE h) wins when a real table named "history" exists — the
    // metadata idiom must not shadow actual data
    val ns = ident.namespace()
    if (ns.length == 1 && ident.name() == "history") {
      val defaultDbForm = ns(0) == "default" &&
        isManifestTable(new Path(root, "history").toString)
      if (!defaultDbForm) {
        val parent = Identifier.of(Array.empty, ns(0))
        if (tableExists(parent))
          return GraftDataSource.GraftHistoryTable(tablePath(parent))
      }
    }
    loadVersion(ident, 0L)
  }

  /** `VERSION AS OF <v>` — Spark routes the SQL time-travel clause here.
    * The version string must be a committed manifest version number.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF '$version' is not a manifest version number")
    }
    require(v > 0, s"graft catalog: VERSION AS OF $v - versions start at 1")
    loadVersion(ident, v)
  }

  /** `TIMESTAMP AS OF` — resolves on the commit time stamped INSIDE each
    * manifest at CAS time (monotone per table, so the axis is honest —
    * never file mtimes, which report whatever the filesystem last
    * touched). The snapshot returned is the one that was current at that
    * instant, Delta-style. Pre-stamp legacy manifests refuse loudly when
    * — and only when — resolution would need them; `VERSION AS OF`
    * always works.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    // Spark hands the clause value in MICROseconds since epoch
    val path = tablePath(ident)
    if (!isManifestTable(path)) throw new NoSuchTableException(ident)
    val v = ManifestTable.versionAtTime(spark, path,
      Math.floorDiv(timestamp, 1000L))
    loadVersion(ident, v)
  }

  private def loadVersion(ident: Identifier, version: Long): Table = {
    // identifier-probing tools (and Spark's own resolution fallbacks)
    // expect TABLE_OR_VIEW_NOT_FOUND for a name this catalog cannot hold:
    // a NESTED namespace (cat.a.b.t) is by construction not a table here,
    // so refusing it IS "no such table" (tableExists already maps it that
    // way; loadTable must agree). Path-SHAPED names (`../x`, `a/b`) stay
    // loud — they signal an escape attempt, not a probe.
    val path = try tablePath(ident) catch {
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("flat namespace") =>
        throw new NoSuchTableException(
          (catalogName +: ident.namespace().toSeq) :+ ident.name())
    }
    if (!isManifestTable(path)) throw new NoSuchTableException(ident)
    val pinned =
      if (version > 0) version else ManifestTable.currentVersion(spark, path)
    if (pinned <= 0) throw new NoSuchTableException(ident)
    // time-travel to a vacuumed/never-committed version must surface as
    // a load error, not an empty scan downstream
    if (version > 0 && !ManifestTable.versionExists(spark, path, version))
      throw new IllegalArgumentException(
        s"graft catalog: ${ident.name()} has no version $version " +
          "(never committed, or vacuumed)")
    // VERSION AS OF freezes the scan at that snapshot (explicitPin);
    // a plain load tracks the CAS head per query like any lakehouse table
    GraftDataSource.GraftTable(path, pinned, explicitPin = version > 0)
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog refuses destructive DDL: $op goes through " +
        "ManifestTable (compactCommit/vacuum), where the CAS and " +
        "reader-grace semantics are explicit")

  /** `CREATE TABLE` (and the create half of CTAS): the table is born as
    * an EMPTY version-1 commit carrying the DDL schema, so `INSERT INTO`
    * has a snapshot schema to align against and concurrent creators
    * serialize through the same CAS as every other commit (two racing
    * CREATEs both land empty snapshots — last wins, nothing lost). A
    * failed CTAS cannot roll back by dropping (drop stays refused), so
    * it leaves the empty/partial table behind — the non-atomic-CTAS
    * contract, stated rather than pretended away.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog: PARTITIONED BY is not supported - manifest tables " +
        "organize by commit; cluster at compaction (compactClustered/ZOrdered)")
    require(schema.nonEmpty, "graft catalog: CREATE TABLE needs columns")
    // a `USING parquet` (or any other format) in THIS catalog would still
    // create a manifest table - refuse rather than silently reinterpret
    Option(properties.get("provider")).filter(_.nonEmpty).foreach(p =>
      require(p.equalsIgnoreCase("graft"),
        s"graft catalog: tables are manifest tables; USING $p is not " +
          "supported (omit USING, or say USING graft)"))
    // LOCATION would be silently IGNORED (the table lands under the
    // catalog root regardless) - a user who asked for /data/elsewhere
    // must hear "no", not discover their data in the warehouse root
    Option(properties.get(
        org.apache.spark.sql.connector.catalog.TableCatalog.PROP_LOCATION))
      .filter(_.nonEmpty).foreach(l => throw new IllegalArgumentException(
        s"graft catalog: LOCATION '$l' is not supported - catalog tables " +
          "live under the catalog root (use the path-based " +
          "spark.read.format(\"graft\") surface for external paths)"))
    val path = tablePath(ident)
    if (isManifestTable(path)) throw new TableAlreadyExistsException(ident)
    // one empty partition, so the parquet writer emits a real footer the
    // snapshot schema resolves from
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      .repartition(1)
    val v = ManifestTable.commit(empty, path, append = false)
    GraftDataSource.GraftTable(path, v)
  }
  /** `ALTER TABLE ADD COLUMNS` is the ONE accepted alter: additive
    * column-add has a safe commit form ([[ManifestTable.addColumnsCommit]]
    * — an empty append carrying the extended schema; history null-fills).
    * Everything else — drop, rename, type change, comment/property
    * updates, positioned adds — would mutate what immutable commits
    * already recorded, and stays refused.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = tablePath(ident)
    if (!isManifestTable(path)) throw new NoSuchTableException(ident)
    val fields = changes.map {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "graft catalog: ALTER TABLE ADD COLUMNS supports top-level " +
            s"columns only, got ${add.fieldNames.mkString(".")}")
        require(add.position() == null,
          "graft catalog: ADD COLUMNS appends at the end - FIRST/AFTER " +
            "would reorder what existing commits recorded")
        require(add.isNullable,
          s"graft catalog: ADD COLUMNS ${add.fieldNames.head} must be " +
            "nullable - existing rows null-fill it")
        StructField(add.fieldNames.head, add.dataType(), nullable = true)
      case other => readOnly(s"ALTER TABLE (${other.getClass.getSimpleName})")
    }
    // intra-statement duplicates pass the exists-in-snapshot check (it
    // only compares against the CURRENT schema) and would surface as a
    // cryptic parquet duplicate-column error - refuse in ALTER's words
    val dup = fields.groupBy(_.name.toLowerCase).collectFirst {
      case (_, fs) if fs.size > 1 => fs.head.name }
    require(dup.isEmpty,
      s"graft catalog: ADD COLUMNS names ${dup.getOrElse("")} more than once")
    val v = ManifestTable.addColumnsCommit(spark, path, fields)
    GraftDataSource.GraftTable(path, v)
  }
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}
