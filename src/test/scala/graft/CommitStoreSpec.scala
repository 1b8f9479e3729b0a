package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import graft.sources.{CommitStore, ConditionalObjectApi, ManifestTable}

/** In-memory emulation of the object-store semantics the conditional-put
  * commit store targets — what S3 (post-2024 `If-None-Match`), GCS
  * (`ifGenerationMatch=0`) and ABFS (ETag preconditions) actually give:
  *
  *   - atomic conditional create ([[putIfNoneMatch]]) — the ONE atomic
  *     publish primitive;
  *   - atomic last-writer-wins overwrite PUT;
  *   - strong read-after-write GET/LIST;
  *   - and NO atomic rename: [[renameNonAtomic]] is copy-then-delete,
  *     exactly as s3a implements it — both halves independently visible,
  *     no fence against a racer (the negative spec demonstrates the
  *     lost-commit this causes for a rename-CAS protocol).
  *
  * State is JVM-global (a bucket outlives any one client), keyed by the
  * full path string.
  */
final class InMemoryObjectApi extends ConditionalObjectApi {
  import InMemoryObjectApi.bucket
  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean =
    bucket.putIfAbsent(key, (bytes.clone(), System.currentTimeMillis())) == null
  override def put(key: String, bytes: Array[Byte]): Unit =
    bucket.put(key, (bytes.clone(), System.currentTimeMillis()))
  override def get(key: String): Option[Array[Byte]] =
    Option(bucket.get(key)).map(_._1.clone())
  override def list(prefix: String): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    bucket.forEach((k, v) => if (k.startsWith(prefix)) out += ((k, v._2)))
    out.result()
  }
  override def delete(key: String): Unit = bucket.remove(key)

  /** Object-store "rename": copy, then delete — NOT atomic, NOT a fence. */
  def renameNonAtomic(src: String, dst: String): Boolean =
    get(src) match {
      case Some(b) => put(dst, b); delete(src); true
      case None => false
    }
}

object InMemoryObjectApi {
  private[graft] val bucket =
    new ConcurrentHashMap[String, (Array[Byte], Long)]()
  private[graft] def clear(): Unit = bucket.clear()
}

/** The pluggable commit store: the same table protocol — CAS appends,
  * races, idempotent tokens, pruning, vacuum — must hold verbatim over
  * conditional-put object semantics, with zero protocol files on the
  * local filesystem.
  */
class CommitStoreSpec extends SparkSpec {
  import spark.implicits._

  private def withObjectStore[T](body: => T): T = {
    InMemoryObjectApi.clear()
    spark.conf.set(CommitStore.ConfKey, classOf[InMemoryObjectApi].getName)
    try body finally spark.conf.set(CommitStore.ConfKey, "rename")
  }

  test("table protocol round-trips through the conditional-put store") {
    withObjectStore {
      val table = Files.createTempDirectory("graft_objstore").toString + "/t"
      (0 until 3).foreach(k => ManifestTable.commit(
        ((k * 100 + 1) to (k * 100 + 100)).map(i => (i.toLong, s"r$i"))
          .toDF("id", "v"),
        table, append = k > 0, statsCols = Seq("id")))

      // reads, time travel, pruning — all through in-memory manifests
      assert(ManifestTable.read(spark, table).count() == 300)
      assert(ManifestTable.read(spark, table, version = 1L).count() == 100)
      assert(ManifestTable.prunedDataDirs(spark, table, "id", "1", "50").size == 1)
      assert(ManifestTable.readRange(spark, table, "id", "1", "50")
        .filter($"id" <= 50).count() == 50)

      // THE point: not one protocol file touched the filesystem — the
      // data dirs are real parquet, the manifests and pointer are objects
      assert(!new java.io.File(s"$table/_manifests").exists(),
        "manifests must live in the object store, not on disk")
      assert(!new java.io.File(s"$table/_latest").exists(),
        "pointer must live in the object store, not on disk")
      assert(InMemoryObjectApi.bucket.keySet().stream()
        .anyMatch(_.contains("_manifests/m-000003")), "manifest objects exist")

      // vacuum reclaims superseded manifests as objects and old data dirs
      // as real directories
      ManifestTable.vacuum(spark, table, keepVersions = 1, graceMs = 0L)
      assert(ManifestTable.read(spark, table).count() == 300)
      assert(!ManifestTable.versionExists(spark, table, 1L),
        "superseded manifest object must be deleted")
      assert(ManifestTable.historyRows(spark, table).map(_._1) == Seq(3L))
    }
  }

  test("4-committer append race under object-store semantics: no commit lost") {
    withObjectStore {
      val table = Files.createTempDirectory("graft_objstore_race").toString + "/t"
      ManifestTable.commit(Seq((1L, "base")).toDF("id", "v"), table, append = false)
      val racers = (10 to 13).map(i => Future {
        ManifestTable.commit(Seq((i.toLong, s"c$i")).toDF("id", "v"),
          table, append = true)
      })
      val versions = Await.result(Future.sequence(racers), 120.seconds)
      assert(versions.toSet.size == 4, s"each racer its own version, got $versions")
      assert(ManifestTable.read(spark, table).count() == 5,
        "all concurrent appends present in the final snapshot")
    }
  }

  test("4 distinct-token idempotent racers land exactly once under the shim") {
    withObjectStore {
      val table = Files.createTempDirectory("graft_objstore_idem").toString + "/t"
      val racers = (0 until 4).map(i => Future {
        ManifestTable.commitIdempotent(
          Seq((i.toLong, s"c$i")).toDF("id", "v"), table, f"batch-$i%05d")
      })
      val versions = Await.result(Future.sequence(racers), 120.seconds)
      assert(versions.toSet.size == 4, s"each token its own version, got $versions")
      assert(ManifestTable.read(spark, table, version = 4L).count() == 4)
      // replay: no-op for data, heals the pointer
      val v = ManifestTable.commitIdempotent(
        Seq((0L, "c0")).toDF("id", "v"), table, "batch-00000")
      assert(v <= 4 && ManifestTable.currentVersion(spark, table) == 4)
    }
  }

  test("torn local-fs reads converge: ChecksumException/EOFException retry until the rename pair lands") {
    // A reader racing a rename-CAS publish on the local (checksummed)
    // filesystem can catch the data file and its .crc sidecar mid-rename.
    // Deterministic stand-in for that window: the first readOnce attempts
    // throw the torn-read signatures, then the file reads clean — read()
    // must absorb the window and return the committed content.
    import graft.sources.RenameCommitStore
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft_tornread")
    val p = new Path(dir.toString, "m-000001.txt")
    val conf = spark.sparkContext.hadoopConfiguration
    new RenameCommitStore(conf).putIfAbsent(p, "committed-content")

    val tornCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val torn = new RenameCommitStore(conf) {
      override protected def readOnce(q: Path): String = {
        val n = tornCount.incrementAndGet()
        if (n == 1) throw new org.apache.hadoop.fs.ChecksumException("torn pair", 0L)
        if (n == 2) throw new java.io.EOFException("appears truncated")
        super.readOnce(q)
      }
    }
    assert(torn.read(p) == "committed-content",
      "read must retry through the torn window and return committed bytes")
    assert(tornCount.get() == 3, "exactly the two torn attempts absorbed")

    // persistent corruption is NOT absorbed: after the bounded attempts
    // the original failure surfaces
    val alwaysTorn = new RenameCommitStore(conf) {
      override protected def readOnce(q: Path): String =
        throw new org.apache.hadoop.fs.ChecksumException("real corruption", 0L)
    }
    intercept[org.apache.hadoop.fs.ChecksumException](alwaysTorn.read(p))
  }

  test("negative proof: check-then-rename over object semantics loses a commit; conditional put does not") {
    InMemoryObjectApi.clear()
    val api = new InMemoryObjectApi
    // Two committers A and B publish m-000002 the way a rename-CAS would
    // on an object store: check absent, upload a temp object, "rename" it
    // over. Deterministic worst-case interleave — both check before either
    // renames (the window is the entire data-write, seconds long in
    // practice):
    val target = "/bucket/t/_manifests/m-000002.txt"
    api.put("/bucket/t/tmp-A", "manifest-from-A".getBytes("UTF-8"))
    api.put("/bucket/t/tmp-B", "manifest-from-B".getBytes("UTF-8"))
    val aSawAbsent = api.get(target).isEmpty
    val bSawAbsent = api.get(target).isEmpty
    assert(aSawAbsent && bSawAbsent)
    val aRenamed = api.renameNonAtomic("/bucket/t/tmp-A", target)
    val bRenamed = api.renameNonAtomic("/bucket/t/tmp-B", target)
    assert(aRenamed && bRenamed, "BOTH renames report success — no fence")
    assert(new String(api.get(target).get, "UTF-8") == "manifest-from-B",
      "A's commit silently vanished: rename-CAS is unsound here")

    // the conditional put IS the fence: second publisher loses, loudly
    val t2 = "/bucket/t/_manifests/m-000003.txt"
    assert(api.putIfNoneMatch(t2, "manifest-from-A".getBytes("UTF-8")))
    assert(!api.putIfNoneMatch(t2, "manifest-from-B".getBytes("UTF-8")))
    assert(new String(api.get(t2).get, "UTF-8") == "manifest-from-A")
  }
}
