package graft

import graft.sources.{GraftDataSource, ManifestTable}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, rng}

/** Soundness of the delete/prune proofs against REAL row evaluation:
  * over random datasets (with nulls) and random predicates,
  *
  *   - `entryAllMatch`  ⟹ every row evaluates the predicate TRUE
  *     (over-deletion — dropping a dir holding a surviving row — is the
  *     catastrophic failure mode of metadata DELETE);
  *   - `!entryCanMatch` ⟹ no row evaluates TRUE (wrong pruning drops
  *     result rows).
  *
  * The stats are derived from the data exactly the way commits record
  * them (min/max over non-null values, null count), and predicate
  * evaluation is SQL three-valued: NULL input → NULL result → not TRUE.
  * (Raw ScalaCheck generators; the scalatestplus bridge isn't on the
  * offline classpath.)
  */
class DeleteProofPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType)))

  // value windows from single-valued to wide, and null rates including
  // ZERO - otherwise all-match proofs (which need no-null dirs and tight
  // ranges) almost never fire and the test exercises only one direction
  private val dataGen: Gen[List[Option[Long]]] = for {
    base <- Gen.choose(-50L, 50L)
    width <- Gen.oneOf(0L, 2L, 10L, 100L)
    nullWeight <- Gen.oneOf(0, 0, 1, 3)
    rows <- Gen.nonEmptyListOf(Gen.frequency(
      9 -> Gen.choose(base, base + width).map(Some(_)),
      nullWeight -> Gen.const(Option.empty[Long])))
  } yield rows

  private val leafGen: Gen[Filter] = for {
    v <- Gen.choose(-55L, 55L)
    f <- Gen.oneOf[Filter](EqualTo("id", v), GreaterThan("id", v),
      GreaterThanOrEqual("id", v), LessThan("id", v),
      LessThanOrEqual("id", v), In("id", Array(v, v + 3, v - 7)),
      IsNotNull("id"), IsNull("id"))
  } yield f

  private val filterGen: Gen[Filter] = for {
    a <- leafGen; b <- leafGen
    f <- Gen.oneOf[Filter](a, And(a, b), Or(a, b), Not(a), And(Not(a), b))
  } yield f

  private def sample[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, rng.Seed(seed)).get

  /** SQL three-valued evaluation; None = NULL. TRUE means the row is
    * deleted / kept by the filter.
    */
  private def eval(f: Filter, v: Option[Long]): Option[Boolean] = f match {
    case EqualTo(_, x) => v.map(_ == x.asInstanceOf[Long])
    case GreaterThan(_, x) => v.map(_ > x.asInstanceOf[Long])
    case GreaterThanOrEqual(_, x) => v.map(_ >= x.asInstanceOf[Long])
    case LessThan(_, x) => v.map(_ < x.asInstanceOf[Long])
    case LessThanOrEqual(_, x) => v.map(_ <= x.asInstanceOf[Long])
    case In(_, xs) => v.map(n => xs.exists(_.asInstanceOf[Long] == n))
    case IsNull(_) => Some(v.isEmpty)
    case IsNotNull(_) => Some(v.nonEmpty)
    case And(l, r) => (eval(l, v), eval(r, v)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, v), eval(r, v)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(inner) => eval(inner, v).map(!_)
    case other => fail(s"generator produced unexpected filter $other")
  }

  test("allMatch implies all rows TRUE; !canMatch implies none (500 random cases)") {
    var allMatchHits = 0
    var cantMatchHits = 0
    (1 to 500).foreach { i =>
      val rows = sample(dataGen, i * 31L)
      val filter = sample(filterGen, i * 31L + 17)
      // stats exactly as a commit records them
      val nonNull = rows.flatten
      val stats =
        if (nonNull.isEmpty) Map.empty[String, ManifestTable.ColStat]
        else Map("id" -> ManifestTable.ColStat("num",
          nonNull.min.toString, nonNull.max.toString,
          Some(rows.count(_.isEmpty).toLong)))
      val e = ManifestTable.Entry("data/d", stats)

      val truths = rows.map(v => eval(filter, v).contains(true))
      if (GraftDataSource.entryAllMatch(schema, e, filter)) {
        allMatchHits += 1
        assert(truths.forall(identity),
          s"case $i: allMatch claimed but a row survives " +
            s"(rows=$rows, filter=$filter, stats=$stats)")
      }
      if (!GraftDataSource.entryCanMatch(schema, e, filter)) {
        cantMatchHits += 1
        assert(!truths.exists(identity),
          s"case $i: canMatch=false but a row matches " +
            s"(rows=$rows, filter=$filter, stats=$stats)")
      }
    }
    // the generators must actually exercise both proof directions
    assert(allMatchHits > 20, s"only $allMatchHits allMatch cases generated")
    assert(cantMatchHits > 20, s"only $cantMatchHits cantMatch cases generated")
  }
}
