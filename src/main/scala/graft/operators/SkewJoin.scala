package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (large) side into `salt`
  * sub-keys and replicate the small side across all salts, so a hot key's
  * rows spread over `salt` tasks instead of one straggler.
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime; this
  * helper is for the planned-skew case (a known hot key, e.g. the "null
  * posting source" or an empty-text fingerprint bucket at 100 TB) and for
  * broadcast-ineligible medium dims.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // Deterministic per-row spread on the large side: hash the whole row.
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salt.toLong)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
