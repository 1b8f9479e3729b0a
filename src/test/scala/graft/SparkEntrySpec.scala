package graft

/** Pins the driver contract itself — the invariants Verify/Bench and the
  * external gate assume but nothing else asserted until r18.
  */
class SparkEntrySpec extends SparkSpec {

  test("every oracle key names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"oracleSql entries with no queries entry (the gate would never run them): $dangling")
  }

  test("every registered query carries a full hash oracle — the board has no rows-only entries") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without oracles (would gate rows-only): $rowsOnly")
  }

  test("qNN numeric prefixes are unique — the bench summary shortens to them") {
    val prefixes = SparkEntry.queries.keySet.toSeq
      .map(n => n.takeWhile(_ != '_') -> n)
    val dup = prefixes.groupBy(_._1).filter(_._2.length > 1)
    assert(dup.isEmpty, s"colliding qNN prefixes: $dup")
  }

  test("entry: the driver's flagship smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
