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

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a nanos long and truncate to Spark's
    * native micros precision (same truncation DuckDB applies on
    * CAST(ts_ns AS TIMESTAMP), so oracles agree).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
