package graft

import org.apache.spark.sql.functions._
import graft.operators.Marts

class MartsSpec extends SparkSpec {

  test("approx quantile sketch lands within 1% of the exact percentile") {
    val exact = Marts.q29Percentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Marts.q63ApproxQuantile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (m, p90)) =>
      val (em, ep90) = exact(flag)
      assert(math.abs(m - em) / em < 0.01, s"$flag median: approx $m vs exact $em")
      assert(math.abs(p90 - ep90) / ep90 < 0.01, s"$flag p90: approx $p90 vs exact $ep90")
    }
  }
}
