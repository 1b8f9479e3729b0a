package graft

import org.apache.spark.sql.functions._
import graft.operators.Marts

class MartsSpec extends SparkSpec {

  test("approx quantile lands inside the rank-error bracket the sketch promises") {
    import graft.sources.Tables
    // percentile_approx bounds RANK error (1/accuracy), not value error:
    // assert each answer's VALUE sits between generous exact quantile
    // brackets around the target rank, which rank-correctness implies
    // regardless of the value distribution's gaps
    val brackets = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.45)").as("m_lo"),
        expr("percentile(l_extendedprice, 0.55)").as("m_hi"),
        expr("percentile(l_extendedprice, 0.85)").as("p90_lo"),
        expr("percentile(l_extendedprice, 0.95)").as("p90_hi"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = Marts.q63ApproxQuantile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == brackets.keySet)
    approx.foreach { case (flag, (m, p90)) =>
      val (mLo, mHi, pLo, pHi) = brackets(flag)
      assert(m >= mLo && m <= mHi, s"$flag median $m outside [$mLo, $mHi]")
      assert(p90 >= pLo && p90 <= pHi, s"$flag p90 $p90 outside [$pLo, $pHi]")
    }
  }
}
