package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.sources.Tables

/** Loader robustness: the driver regenerates the testdata between rounds
  * and has shipped `events.ts` as both parquet TIMESTAMP(NANOS) (surfacing
  * as a nanos long under `nanosAsLong`) and native TIMESTAMP(MICROS).
  * `normalizeEpochNanos` must read both to identical TimestampType values.
  */
class TablesSpec extends SparkSpec {

  test("normalizeEpochNanos: nanos-long and native-micros encodings agree") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tables").toString

    // 2024-09-23 10:00:00.123456 UTC, plus an epoch and a negative stamp
    val micros = Seq(1727086800123456L, 0L, -1727086800000001L)

    // encoding 1: epoch-nanos long (what nanosAsLong yields from NANOS).
    // This writes a plain INT64 column as a stand-in; the GENUINE
    // TIMESTAMP(NANOS) annotation (Spark's writer can't emit it) is
    // exercised by the dedicated test below via parquet-mr's low-level
    // writer.
    micros.map(us => us * 1000L).toDF("ts")
      .write.parquet(s"$dir/as_nanos.parquet")
    // encoding 2: native TimestampType (parquet TIMESTAMP(MICROS, adjusted))
    micros.toDF("us")
      .selectExpr("timestamp_micros(us) AS ts")
      .write.parquet(s"$dir/as_micros.parquet")
    // encoding 3: TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZ,
    // the encoding the driver testdata ships as of r11 (session tz is UTC,
    // so the NTZ wall-clock equals the instant)
    micros.toDF("us")
      .selectExpr("cast(timestamp_micros(us) AS timestamp_ntz) AS ts")
      .write.parquet(s"$dir/as_ntz.parquet")

    def norm(name: String) =
      Tables.normalizeEpochNanos(Tables.load(spark, dir, name), "ts")
    def vals(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.selectExpr("unix_micros(ts) AS us").as[Long].collect().sorted.toSeq

    for (enc <- Seq("as_nanos", "as_micros", "as_ntz")) {
      val df = norm(enc)
      assert(df.schema("ts").dataType == TimestampType, enc)
      assert(vals(df) == micros.sorted, enc)
    }
  }

  test("genuine parquet TIMESTAMP(NANOS): the real nanosAsLong surface reads correctly") {
    // Spark's DataFrame writer cannot produce TIMESTAMP(NANOS), so the
    // encoding-agreement test above stands in with a plain INT64 column.
    // This test writes the REAL annotation through parquet-mr's low-level
    // example writer (on the classpath via Spark's own parquet-hadoop),
    // locking in the vectorized-reader + legacy-flag surface the driver
    // testdata shipped through r10 — independent of what the current
    // generator happens to emit.
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.hadoop.fs.Path

    val dir = Files.createTempDirectory("graft_tables_nanos").toString
    val micros = Seq(1727086800123456L, 0L, -1727086800000001L)

    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true,
        LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("spark_schema")
    val file = new Path(s"$dir/true_nanos.parquet/part-0.parquet")
    val w = ExampleParquetWriter.builder(file).withType(schema)
      .withConf(spark.sparkContext.hadoopConfiguration).build()
    try {
      val gf = new SimpleGroupFactory(schema)
      micros.foreach { us =>
        val g = gf.newGroup(); g.add("ts", us * 1000L); w.write(g)
      }
    } finally w.close()

    // Restore the session's PRIOR flag value afterwards (not a hardcoded
    // "false") so this test doesn't leak config state into later tests
    // sharing the session (r13 advice).
    val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    try {
      // without the legacy flag Spark refuses TIMESTAMP(NANOS) outright —
      // the gotcha Tables.events exists to absorb
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      intercept[Exception](
        spark.read.parquet(s"$dir/true_nanos.parquet").collect())

      // through the events-loader path: nanosAsLong surfaces LongType,
      // normalizeEpochNanos truncates to micros as TimestampType
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = Tables.normalizeEpochNanos(
        Tables.load(spark, dir, "true_nanos"), "ts")
      assert(df.schema("ts").dataType == TimestampType)
      import spark.implicits._
      val got = df.selectExpr("unix_micros(ts) AS us").as[Long]
        .collect().sorted.toSeq
      assert(got == micros.sorted, got.toString)
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  test("normalizeEpochNanos: micros-magnitude INT64 fails loudly instead of shifting 1000x") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tables_guard").toString
    // a regeneration that ships ts as RAW epoch-micros INT64 (no parquet
    // timestamp annotation) also surfaces as LongType — the nanos division
    // must refuse it, not silently land every instant in January 1970
    Seq(1727086800123456L).toDF("ts").write.parquet(s"$dir/raw_micros.parquet")
    val df = Tables.normalizeEpochNanos(Tables.load(spark, dir, "raw_micros"), "ts")
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("below epoch-nanos magnitude")),
      s"expected the magnitude guard, got: $e")
  }

  test("Tables.events loads the current driver testdata with a timestamp ts") {
    val events = Tables.events(spark, sfDir)
    assert(events.schema("ts").dataType == TimestampType)
    assert(events.limit(1).count() == 1)
  }
}
