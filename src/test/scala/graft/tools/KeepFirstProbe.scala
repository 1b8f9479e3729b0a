package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Ad-hoc probe: keep-first substring scrub (q140) on the ADVERSARIAL
  * topology — a corpus where every gram is viral (100k identical docs,
  * every gram group 100k wide) versus a same-sized diverse corpus.
  * The min(struct) firsts partial-aggregate map-side, so the viral
  * corpus must NOT hot-partition into one sort: comparable walls on
  * both topologies evidence the no-Window design the plan spec pins.
  */
object KeepFirstProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("keepfirst-probe")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 100000L
    val viralText = (1 to 40).map(i => s"v$i").mkString(" ")
    val viral = spark.range(n).select(col("id").as("doc_id"),
      lit(viralText).as("text"))
    // diverse: same doc count/length, every doc distinct (id-salted words)
    val diverse = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 40).map(i =>
        concat(lit(s"w$i"), pmod(col("id") * i, lit(9999)))): _*).as("text"))
    for ((name, df) <- Seq("viral" -> viral, "diverse" -> diverse)) {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime
        val out = TextOps.keepFirstScrub(df)
        val kept = out.agg(sum(col("n_tokens") - col("n_removed"))).collect()(0).getLong(0)
        graft.CacheHygiene.releaseTree(out)
        ((System.nanoTime - t0) / 1e9, kept)
      }
      println(f"KEEPFIRST topology=$name docs=$n keptTokens=${walls.head._2} " +
        f"wall=${walls.map(_._1).min}%.2f")
    }
    spark.stop()
  }
}
