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
    // the raw GK outputs (q63's oracled form now folds these into ok
    // booleans, so the bracket property is asserted on the sketch itself)
    val approx = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9)), lit(10000)).as("qs"))
      .select(col("l_returnflag"),
        col("qs").getItem(0).as("m"), col("qs").getItem(1).as("p90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == brackets.keySet)
    approx.foreach { case (flag, (m, p90)) =>
      val (mLo, mHi, pLo, pHi) = brackets(flag)
      assert(m >= mLo && m <= mHi, s"$flag median $m outside [$mLo, $mHi]")
      assert(p90 >= pLo && p90 <= pHi, s"$flag p90 $p90 outside [$pLo, $pHi]")
    }
    // and the shipped q63's in-query tolerance gate must agree
    Marts.q63ApproxQuantile(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Boolean]("median_ok") && r.getAs[Boolean]("p90_ok"), r.toString)
    }
  }

  test("approx distinct lands inside 3x rsd of exact in the shipped gated form") {
    import graft.sources.Tables
    val rows = Marts.q44ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_3rsd"), r.toString)
      assert(r.getAs[Long]("n_parts_exact") > 0, r.toString)
    }
  }
}
