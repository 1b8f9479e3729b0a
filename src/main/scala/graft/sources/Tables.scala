package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical loaders for the driver-generated test tables.
  *
  * Mirrors the reference's lakehouse table surface (finnoio/jobhouse,
  * docs/Pipeline Architecture.mermaid): a star-schema gold layer plus a raw
  * event stream (`events`), document bodies (`documents`) and ML feature
  * vectors (`embeddings`).
  *
  * All loads are plain parquet scans so Catalyst can push filters and prune
  * columns; never cache here — let each query decide its own plan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize an event-time column to Spark-native TimestampType
    * regardless of how the parquet writer encoded it. Three encodings have
    * shipped in the driver testdata across rounds:
    *
    *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *     outright unless `spark.sql.legacy.parquet.nanosAsLong` is set, in
    *     which case the column surfaces as a nanos `LongType` — truncate to
    *     micros (the same truncation DuckDB applies on
    *     `CAST(ts_ns AS TIMESTAMP)`, so oracles agree);
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *     `TimestampNTZType` — cast to TimestampType (sessions here pin
    *     `spark.sql.session.timeZone=UTC`, so the wall-clock values are
    *     preserved and DuckDB's naive reading of the same file agrees);
    *   - parquet TIMESTAMP(MICROS, adjusted): already `TimestampType` —
    *     pass through untouched.
    *
    * Dispatching on the *loaded* dataType (not a config guess) means a
    * driver-side regeneration of the testdata with any of the encodings
    * keeps every consumer green.
    */
  def normalizeEpochNanos(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        import org.apache.spark.sql.functions.{abs, concat, lit, raise_error, timestamp_micros, when}
        // Magnitude guard (r12 advice): a LongType here is trusted to be
        // epoch-NANOS (the `nanosAsLong` surface) — but a raw unannotated
        // INT64 column of epoch-micros/millis would ALSO load as LongType,
        // and dividing it by 1000 would be silently wrong by 1000x. Any
        // plausible instant is >= 1e16 in nanos (~1970-04) while micros
        // stay < 1e16 until year 2286 and millis far longer, so a non-null
        // non-zero value below 1e16 fails loudly instead of shifting.
        // 0 passes as the epoch sentinel the encoding spec exercises.
        // Trade-off, on purpose: a GENUINE nanos instant within ~115
        // days of 1970 also trips the guard — a loud false positive on
        // pathological data beats a silent 1000x shift of every instant
        // (no magnitude can distinguish near-epoch nanos from micros).
        //
        // Built with the Column API (r13 advice) — no SQL text, so a column
        // name containing quotes or backticks can't break parsing; colName
        // appears only as data (in the error literal) or as a resolved
        // reference. SQL `div 1000` (truncate toward zero) is expressed as
        // long → decimal(38,0) → /1000 → cast long: the quotient's ≤17
        // integer digits + 3 fractional digits fit the result decimal
        // exactly, and decimal→long casts truncate toward zero. A double
        // division instead would lose precision past 2^53 ≈ 9.0e15 — below
        // the 1e16 guard floor, i.e. for every value the guard admits.
        val c = df.col(colName)
        val micros =
          (c.cast(org.apache.spark.sql.types.DecimalType(38, 0)) / lit(1000)).cast("long")
        df.withColumn(colName, timestamp_micros(
          when(c.isNull || c === 0L || abs(c) >= 10000000000000000L, micros)
            .otherwise(raise_error(concat(
              lit("normalizeEpochNanos(" + colName + "): value "),
              c.cast("string"),
              lit(" is below epoch-nanos magnitude (1e16); the column likely " +
                "encodes epoch-micros/millis as plain INT64 and dividing by " +
                "1000 would shift instants 1000x"))))))
      case org.apache.spark.sql.types.TimestampNTZType =>
        import org.apache.spark.sql.functions.col
        df.withColumn(colName,
          col(colName).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` arrives as either parquet TIMESTAMP(NANOS) or
    * TIMESTAMP(MICROS) depending on the generator; `normalizeEpochNanos`
    * dispatches on the loaded type so both read identically. The
    * `nanosAsLong` flag is a no-op on non-NANOS columns, so it is safe to
    * set unconditionally.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEpochNanos(load(s, d, "events"), "ts")
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
