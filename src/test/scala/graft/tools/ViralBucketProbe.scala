package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B probe for the r17 de-windowing of the pair/cluster kernels'
  * bucket width/min annotation (widthCappedPairs, onePassClusters):
  * a planted topology where ONE band bucket holds millions of members
  * (the viral-boilerplate case the star-routing exists for) plus a
  * dispersed organic tail, annotated two ways —
  *
  *   A (shipped): groupBy(key).agg(count, min(struct)) + key join —
  *     map-side combinable, the viral key collapses to ONE stats row
  *     on every mapper before any shuffle;
  *   B (pre-r17): count/min over Window.partitionBy(key) — WindowExec
  *     buffers the whole viral bucket in ONE task just to MEASURE it.
  *
  * Identical outputs (asserted), wall clocks printed. Run:
  *   sbt "Test/runMain graft.tools.ViralBucketProbe [viralRows] [organicRows]"
  */
object ViralBucketProbe {
  def main(args: Array[String]): Unit = {
    val viral = if (args.length > 0) args(0).toLong else 4000000L
    val organic = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one viral key (band=0, sig=0) + DISJOINT organic keys of width ~10
    // (sigs offset by 1 so no organic row can merge into the viral
    // bucket; the modulus is floored at 1 so a tiny organic arg can't
    // divide by zero into null sigs)
    val orgBuckets = math.max(1L, organic / 10)
    val bucketed = spark.range(viral + organic)
      .select(col("id").as("doc_id"),
        when(col("id") < viral, lit(0L))
          .otherwise(pmod(col("id"), lit(orgBuckets)) + 1L).as("sig"),
        lit(0).as("band"))
      .localCheckpoint(true)

    def time(what: String)(df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$what%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
      n
    }

    // the trailing filter CONSUMES w and m (always true): without it,
    // count() lets column pruning DELETE the unused Window/join from the
    // plan and the probe times a bare scan
    def consume(df: DataFrame): DataFrame =
      df.filter(col("w") > 0 && col("m.doc_id") >= 0)
    val aggAnnotated = consume {
      val stats = bucketed.groupBy("band", "sig")
        .agg(count(lit(1)).as("w"), min(struct(col("doc_id"))).as("m"))
      bucketed.join(stats, Seq("band", "sig"))
    }
    val winAnnotated = consume {
      val b = Window.partitionBy("band", "sig")
      bucketed
        .withColumn("w", count(lit(1)).over(b))
        .withColumn("m", min(struct(col("doc_id"))).over(b))
    }
    // identity check OVER THE VALUES, not just counts (the consume()
    // filter is always-true, so equal counts alone could not detect a
    // divergent w/m): an order-insensitive checksum of every annotated
    // row must match between the two forms
    // bit_xor, not sum: ANSI long-sum overflows at a few hundred
    // thousand hashes; XOR is order-insensitive and safe (rows are
    // distinct by doc_id, so pairwise cancellation can't hide anything)
    def digest(df: DataFrame): Long = df
      .agg(expr("bit_xor(xxhash64(doc_id, w, m.doc_id))"))
      .collect()(0).getLong(0)
    require(digest(aggAnnotated) == digest(winAnnotated),
      "annotation forms diverge: groupBy+join vs window produce different w/m")
    val passes = 2
    for (p <- 1 to passes) {
      println(s"-- pass $p (viral=$viral organic=$organic) --")
      val na = time("A groupBy+join")(aggAnnotated)
      val nb = time("B window")(winAnnotated)
      require(na == nb, s"annotation row counts must agree: $na vs $nb")
    }
    // and the shipped kernel end to end: the viral bucket star-routes
    time("widthCappedPairs") {
      graft.operators.VectorOps.widthCappedPairs(
        bucketed, Seq("band", "sig"), Nil, maxBucketWidth = 512)
    }
    spark.stop()
  }
}
