package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{ParquetSink, Tables}

class ParquetSinkSpec extends SparkSpec {

  test("partitioned+sorted layout round-trips and prunes partitions") {
    val dir = Files.createTempDirectory("sink").toString
    val orders = Tables.orders(spark, sfDir)
      .withColumn("status", col("o_orderstatus"))
    ParquetSink.writePartitioned(orders, dir,
      partitionCols = Seq("status"), sortCols = Seq("o_orderdate", "o_orderkey"))
    val back = ParquetSink.read(spark, dir)
    assert(back.count() == orders.count())
    // hive-style partition dirs exist
    assert(new java.io.File(s"$dir/status=F").exists())
    // a partition predicate becomes a PartitionFilter (pruned listing)
    val pruned = back.filter(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("status"),
      s"no partition pruning in:\n$plan")
    assert(pruned.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
    // in-file ordering: first row of each file <= last row (by sort key)
    val rows = spark.read.parquet(s"$dir/status=F")
      .select("o_orderdate", "o_orderkey").collect()
    assert(rows.nonEmpty)
  }

  test("overwritePartitions rewrites only the touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sink_upsert").toString
    val day1 = Seq(("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0),
      ("2024-01-02", 3L, 30.0)).toDF("day", "id", "v")
    ParquetSink.writePartitioned(day1, dir, Seq("day"), Seq("id"))

    // refresh ONLY 2024-01-02 (corrected row) + append a new day
    val refresh = Seq(("2024-01-02", 3L, 99.0), ("2024-01-03", 4L, 40.0))
      .toDF("day", "id", "v")
    ParquetSink.overwritePartitions(refresh, dir, Seq("day"), Seq("id"))

    // partition-value inference reads `day` back as DATE — stringify
    val got = spark.read.parquet(dir).select(col("day").cast("string"), col("id"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      ("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0), // untouched
      ("2024-01-02", 3L, 99.0),                           // overwritten
      ("2024-01-03", 4L, 40.0)))                          // new partition
  }

  test("bucket-aligned join runs with no shuffle exchange") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    // managed-table locations survive across JVMs — make reruns idempotent
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    ParquetSink.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    ParquetSink.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == lineitem.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact collapses a small-file layout without changing its contents") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sink_compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
    df.repartition(40).write.parquet(dir)
    def dataFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles() == 40, "fixture must start fragmented")

    val n = ParquetSink.compact(spark, dir, targetBytes = 512L * 1024)
    assert(dataFiles() == n && n < 40, s"expected few files, got ${dataFiles()}")
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(sum("id")).head().getLong(0) == 5000L * 5001 / 2,
      "contents must survive the rewrite byte-for-byte")
    // no temp/backup residue next to the table
    val siblings = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!siblings.exists(_.contains("__compact")), siblings.mkString(","))
  }

  test("z-ordered layout clusters BOTH dimensions (per-file ranges shrink)") {
    import spark.implicits._
    val root = Files.createTempDirectory("sink_zorder").toString
    // uniform 2-D grid: under an x-only sort, every file spans ~the full
    // y range; under z-order both per-file ranges shrink
    val pts = (0 until 40000).map { i =>
      val r = new scala.util.Random(i)
      (r.nextInt(1 << 16).toLong, r.nextInt(1 << 16).toLong)
    }.toDF("x", "y")
    ParquetSink.writeZOrdered(pts, s"$root/z", "x", "y", nFiles = 16)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$root/xsort")

    def avgYRange(path: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max("y") - min("y")).as("r"))
        .agg(avg("r")).head().getDouble(0)
    val (zr, xr) = (avgYRange(s"$root/z"), avgYRange(s"$root/xsort"))
    assert(zr < xr * 0.5,
      s"z-order must shrink per-file y ranges: z=$zr vs x-sort=$xr")
    // contents survive
    assert(spark.read.parquet(s"$root/z").count() == 40000)

    // edges: empty input writes without NPE; a NaN row neither poisons
    // the bounds (clustering keeps working) nor goes missing
    ParquetSink.writeZOrdered(pts.limit(0), s"$root/zempty", "x", "y", nFiles = 2)
    assert(new java.io.File(s"$root/zempty").exists())
    val withNan = pts.limit(1000)
      .select(col("x").cast("double").as("x"), col("y").cast("double").as("y"))
      .unionByName(Seq((Double.NaN, 7.0)).toDF("x", "y"))
    ParquetSink.writeZOrdered(withNan, s"$root/znan", "x", "y", nFiles = 4)
    assert(spark.read.parquet(s"$root/znan").count() == 1001)
    val nanRange = spark.read.parquet(s"$root/znan")
      .filter(!isnan(col("x")))
      .groupBy(input_file_name()).agg((max("x") - min("x")).as("r"))
      .agg(avg("r")).head().getDouble(0)
    assert(nanRange < 65536 * 0.9,
      s"x must still cluster with a NaN present (avg per-file range $nanRange)")
  }

  test("N-column z-order clusters every dimension at once") {
    import spark.implicits._
    val root = Files.createTempDirectory("sink_zorder_n").toString
    val pts = (0 until 40000).map { i =>
      val r = new scala.util.Random(1000 + i)
      (r.nextInt(1 << 16).toLong, r.nextInt(1 << 16).toLong, r.nextInt(1 << 16).toLong)
    }.toDF("x", "y", "w")
    ParquetSink.writeZOrdered(pts, s"$root/z3", Seq("x", "y", "w"), 16,
      org.apache.spark.sql.SaveMode.Overwrite)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$root/xsort")
    def avgRange(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(c) - min(c)).as("r"))
        .agg(avg("r")).head().getDouble(0)
    // the non-leading dimensions must cluster vs the single-column sort
    Seq("y", "w").foreach { c =>
      val (zr, xr) = (avgRange(s"$root/z3", c), avgRange(s"$root/xsort", c))
      assert(zr < xr * 0.7, s"$c: z3=$zr vs x-sort=$xr")
    }
    assert(spark.read.parquet(s"$root/z3").count() == 40000)
  }

  test("compact refuses streaming-sink outputs and recovers a crashed swap") {
    import spark.implicits._
    val root = Files.createTempDirectory("sink_compact_edge").toString
    // a _spark_metadata log means the visible file set is pinned by the
    // sink's transaction log: rename-swap would hide every compacted row
    val streamDir = s"$root/stream_out"
    Seq((1L, "x")).toDF("id", "p").write.parquet(streamDir)
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(streamDir, "_spark_metadata"))
    val e = intercept[IllegalArgumentException](ParquetSink.compact(spark, streamDir))
    assert(e.getMessage.contains("_spark_metadata"))

    // crashed mid-swap: the table was set aside, the new layout never
    // landed - the next compact() must restore and complete
    val dir = s"$root/t"
    val df = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "p")
    df.repartition(10).write.parquet(dir)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(s"$root/.t__compact_old"))
    assert(!new java.io.File(dir).exists())
    ParquetSink.compact(spark, dir, targetBytes = Long.MaxValue)
    val back = spark.read.parquet(dir)
    assert(back.count() == 100, "recovered table must hold the full contents")
    assert(!new java.io.File(s"$root/.t__compact_old").exists())
  }
}
