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
    // Row-position salt: byte-identical duplicate rows (the usual hot-key
    // shape: null/empty-content records) must still spread across salts,
    // so a content hash is NOT usable here. The salt only affects
    // partitioning, never the join result, so non-determinism across
    // retries is safe.
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
