package graft

import org.scalacheck.{Gen, rng}
import graft.operators.Lifecycle

/** Property: cdcDiff output is a complete, sound change log — applying
  * the classified changes to the old snapshot reconstructs the new one.
  * (Raw ScalaCheck generators; the scalatestplus bridge isn't on the
  * offline classpath.)
  */
class CdcPropertySpec extends SparkSpec {

  private val snapshotGen: Gen[Map[Long, (String, Double)]] =
    Gen.mapOf(for {
      k <- Gen.choose(0L, 30L)
      s <- Gen.oneOf("a", "b", "c")
      p <- Gen.choose(0, 999).map(_ / 10.0)
    } yield k -> (s, p))

  private def sample(seedN: Long): Map[Long, (String, Double)] =
    snapshotGen(Gen.Parameters.default, rng.Seed(seedN))
      .getOrElse(Map.empty)

  test("applying cdcDiff's change log to old reconstructs new (20 random pairs)") {
    import spark.implicits._
    (1 to 20).foreach { i =>
      val oldM = sample(i * 2L)
      val newM = sample(i * 2L + 1)
      val oldDf = oldM.toSeq.map { case (k, (s, p)) => (k, s, p) }.toDF("id", "status", "price")
      val newDf = newM.toSeq.map { case (k, (s, p)) => (k, s, p) }.toDF("id", "status", "price")
      val changes = Lifecycle.cdcDiff(oldDf, newDf, "id", Seq("status", "price"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("change_type")).toMap
      // soundness + completeness, key by key
      (oldM.keySet ++ newM.keySet).foreach { k =>
        val expected = (oldM.get(k), newM.get(k)) match {
          case (None, Some(_)) => Some("insert")
          case (Some(_), None) => Some("delete")
          case (Some(a), Some(b)) if a != b => Some("update")
          case _ => None // unchanged rows must NOT appear
        }
        assert(changes.get(k) == expected,
          s"seed $i key $k: got ${changes.get(k)}, expected $expected")
      }
      // reconstruction: old + changes == new
      val reconstructed =
        oldM.filter { case (k, _) => !changes.get(k).contains("delete") } ++
          newM.view.filterKeys(k =>
            changes.get(k).contains("insert") || changes.get(k).contains("update")).toMap
      assert(reconstructed == newM, s"seed $i reconstruction mismatch")

      // and the ENGINE-side round trip: cdcApply(old, cdcDelta(old, new)) == new
      val applied = Lifecycle.cdcApply(oldDf,
          Lifecycle.cdcDelta(oldDf, newDf, "id", Seq("status", "price")),
          "id", Seq("status", "price"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      assert(applied == newM, s"seed $i: cdcApply round-trip mismatch")
    }
  }

  test("null-keyed rows classify once and round-trip (no phantom insert+delete)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def frame(rows: Seq[(Option[Long], String)]) =
      rows.toDF("id", "status")
        .select(col("id").cast("long").as("id"), col("status"))
    // null key unchanged on both sides + one real change elsewhere
    val oldDf = frame(Seq(None -> "keep", Some(1L) -> "a"))
    val newDf = frame(Seq(None -> "keep", Some(1L) -> "b"))
    val delta = Lifecycle.cdcDelta(oldDf, newDf, "id", Seq("status")).collect()
    assert(delta.length == 1 && delta.head.getString(1) == "update",
      s"unchanged null-key row must produce no delta: ${delta.mkString(";")}")

    // a CHANGED null-keyed row must evict its snapshot counterpart
    val newDf2 = frame(Seq(None -> "changed", Some(1L) -> "a"))
    val applied = Lifecycle.cdcApply(oldDf,
        Lifecycle.cdcDelta(oldDf, newDf2, "id", Seq("status")), "id", Seq("status"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toSet
    assert(applied == Set(None -> "changed", Some(1L) -> "a"), applied.toString)
  }

  test("adversarial column names round-trip through the merge's flag namespaces") {
    import spark.implicits._
    // every name family a user column could collide with: the merge's own
    // __cdc_/__s_/__d_ namespaces, the diff's old_/new_ renames and
    // __old_present/__new_present flags, and the bare words the r7
    // anti-join form would have tripped on
    val adversarialPairs = Seq(
      ("present", "change"),
      ("__cdc_present__", "__cdc_change__"),
      ("__s_present", "__d_change"),
      ("__old_present", "__new_present"),
      ("old_id", "new_id"),
      ("old_old_x", "new_new_x"))
    adversarialPairs.zipWithIndex.foreach { case ((a, b), i) =>
      (1 to 3).foreach { seed =>
        val oldM = sample(100L + i * 10 + seed)
        val newM = sample(200L + i * 10 + seed)
        val oldDf = oldM.toSeq.map { case (k, (s, p)) => (k, s, p) }.toDF("id", a, b)
        val newDf = newM.toSeq.map { case (k, (s, p)) => (k, s, p) }.toDF("id", a, b)
        val applied = Lifecycle.cdcApply(oldDf,
            Lifecycle.cdcDelta(oldDf, newDf, "id", Seq(a, b)), "id", Seq(a, b))
        assert(applied.columns.toSeq == Seq("id", a, b),
          s"($a,$b): output columns must keep the user's names")
        val appliedM = applied.collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
        assert(appliedM == newM,
          s"($a,$b) seed $seed: round-trip corrupted by column-name collision")
      }
    }

    // change_type is the delta format's own marker: structurally
    // unrepresentable as a payload column, refused loudly at both ends
    val df = Seq((1L, "x")).toDF("id", "change_type")
    val e1 = intercept[IllegalArgumentException](
      Lifecycle.cdcDelta(df, df, "id", Seq("change_type")))
    assert(e1.getMessage.contains("change_type"))
    val e2 = intercept[IllegalArgumentException](
      Lifecycle.cdcApply(df, df, "id", Seq("change_type")))
    assert(e2.getMessage.contains("change_type"))
    val keyed = Seq(("x", 1L)).toDF("change_type", "v")
    val e3 = intercept[IllegalArgumentException](
      Lifecycle.cdcDelta(keyed, keyed, "change_type", Seq("v")))
    assert(e3.getMessage.contains("change_type"))
  }
}
