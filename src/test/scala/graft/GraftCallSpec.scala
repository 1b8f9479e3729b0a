package graft

import java.nio.file.Files

import graft.sources.ManifestTable
import org.apache.spark.sql.functions.col

/** `CALL graft_*` maintenance procedures: compaction, clustered
  * compaction, and vacuum from pure SQL, with everything else delegating
  * to Spark's parser untouched.
  */
class GraftCallSpec extends SparkSpec {
  import spark.implicits._

  test("CALL compact/vacuum round-trip; clustered compact keeps pruning") {
    val table = Files.createTempDirectory("graft_call").toString + "/t"
    (0 until 4).foreach(k => ManifestTable.commit(
      ((k * 100 + 1) to (k * 100 + 100)).map(i => (i.toLong, s"r$i"))
        .toDF("id", "v"),
      table, append = k > 0, statsCols = Seq("id")))
    assert(ManifestTable.manifestEntries(spark, table, 4L).size == 4)

    // plain compact: one statement, eagerly executed, result row reports
    // the committed version
    val res = spark.sql(s"CALL graft_compact('$table')").collect()
    assert(res.length == 1 && res.head.getString(0) == "graft_compact" &&
      res.head.getLong(1) == 5L, res.mkString(","))
    assert(ManifestTable.manifestEntries(spark, table, 5L).size == 1)
    assert(ManifestTable.read(spark, table).count() == 400)

    // clustered compact: pruning restored (the plain compact above
    // collapsed the table to ONE dir, so readRange degenerated)
    spark.sql(s"CALL graft_compact_clustered('$table', 'id', 4)")
    val pruned = ManifestTable.readRange(spark, table, "id", "1", "50")
    assert(pruned.count() < 400 && pruned.filter(col("id") <= 50).count() == 50,
      "range-clustered commits must prune again")

    // vacuum: superseded versions' bytes reclaimed, head intact
    spark.sql(s"CALL graft_vacuum('$table', 1, 0)")
    assert(ManifestTable.read(spark, table).count() == 400)
    val dataDirs = new java.io.File(s"$table/data").listFiles().length
    assert(dataDirs == 4, s"only the clustered head's 4 dirs survive: $dataDirs")

    // unknown procedure and bad arity fail loudly
    val unknown = intercept[Exception](spark.sql(s"CALL graft_nope('$table')"))
    assert(unknown.getMessage.contains("unknown procedure"), unknown.getMessage)
    val arity = intercept[Exception](spark.sql("CALL graft_compact()"))
    assert(arity.getMessage.contains("graft_compact(path"), arity.getMessage)

    // everything else still parses through Spark verbatim
    assert(spark.sql("SELECT 1 + 1").head.getInt(0) == 2)
    intercept[Exception](spark.sql("CALL not_a_graft_proc(1)")) // Spark's error
  }

  test("CALL arg/comment edge cases fail with the right message") {
    val table = Files.createTempDirectory("graft_call_edge").toString + "/t"
    ManifestTable.commit(Seq((1L, "a")).toDF("id", "v"), table, append = false)

    // trailing line comments (and a trailing semicolon) still route to the
    // procedure instead of delegating to Spark's unknown-procedure error
    val res = spark.sql(s"CALL graft_compact('$table'); -- nightly job")
      .collect()
    assert(res.head.getLong(1) == 2L, res.mkString(","))

    // quoted-empty path: kept as an arg, refused by the procedure with its
    // usage string (NOT a misleading arity error)
    val empty = intercept[Exception](spark.sql("CALL graft_compact('')"))
    assert(empty.getMessage.contains("path must be non-empty"), empty.getMessage)

    // numeric arg that does not parse: usage string, not a bare
    // NumberFormatException
    val badNum = intercept[Exception](
      spark.sql(s"CALL graft_compact('$table', 'big')"))
    assert(badNum.getMessage.contains("graft_compact(path"), badNum.getMessage)

    // a statement that commits to CALL graft_ but cannot parse fails
    // loudly here, naming the expected shape
    val malformed = intercept[Exception](spark.sql("CALL graft_compact 'x'"))
    assert(malformed.getMessage.contains("cannot parse CALL statement"),
      malformed.getMessage)

    // a quoted path CONTAINING double-dash is not truncated as a comment
    val dashed = intercept[Exception](
      spark.sql("CALL graft_compact('/no/such--path')"))
    assert(!dashed.getMessage.contains("cannot parse"), dashed.getMessage)
  }

  test("CALL graft_diff summarizes a version diff from pure SQL") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft_calldiff").toString + "/t"
    val v1 = graft.sources.ManifestTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), table, append = false,
      statsCols = Seq("id"))
    graft.sources.ManifestTable.mergeCommit(spark, table,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), keyCols = Seq("id"),
      statsCols = Seq("id"))
    val row = spark.sql(s"CALL graft_diff('$table', 'id', $v1)").collect()(0)
    assert(row.getString(2) == "added=1 removed=0 changed=1",
      s"summary must count the merge's touched keys: $row")
    val arity = intercept[Exception](spark.sql(s"CALL graft_diff('$table')"))
    assert(arity.getMessage.contains("graft_diff(path, keyCol, fromVersion"))
  }

  test("CALL graft_clone / graft_restore drive the zero-copy ops from pure SQL") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_callclone").toString
    val src = s"$root/src"
    val tgt = s"$root/tgt"
    graft.sources.ManifestTable.commit(
      (1L to 5L).toDF("id"), src, append = false)                    // v1
    graft.sources.ManifestTable.commit(
      Seq(99L).toDF("id"), src, append = false)                      // v2 (overwrite)

    val cl = spark.sql(s"CALL graft_clone('$src', '$tgt', 1)").collect()(0)
    assert(cl.getLong(1) == 1L && cl.getString(2).contains("shallow-cloned"))
    assert(graft.sources.ManifestTable.read(spark, tgt)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted == (1L to 5L),
      "clone pinned the REQUESTED version, not the head")

    val rs = spark.sql(s"CALL graft_restore('$src', 1)").collect()(0)
    assert(rs.getLong(1) == 3L && rs.getString(2).contains("restored"))
    assert(graft.sources.ManifestTable.read(spark, src).count() == 5L)

    val arity = intercept[Exception](spark.sql(s"CALL graft_restore('$src')"))
    assert(arity.getMessage.contains("graft_restore(path, toVersion)"))
  }

  test("CALL graft_impact_build / graft_impact_search drive the lexical tier from pure SQL (r20)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_callimp").toString
    val idx = s"$root/idx"
    val corpus = (0 until 40).map(i =>
      (100L + i, s"common filler text rare$i unique$i")).toDF("doc_id", "text")
    val queries = Seq((1L, "rare7 unique7 filler"), (2L, "rare22 common text"))
      .toDF("doc_id", "text")
    corpus.createOrReplaceTempView("call_imp_corpus")
    queries.createOrReplaceTempView("call_imp_queries")

    val b = spark.sql(s"CALL graft_impact_build('call_imp_corpus', '$idx')")
      .collect()(0)
    assert(b.getLong(1) == 40L && b.getString(2).contains("froze impact index"),
      s"build must report the registered doc count: $b")

    val viaSql = spark.sql(
      s"CALL graft_impact_search('$idx', 'call_imp_queries', 10, 10)")
    assert(viaSql.columns.toSeq == Seq("q_id", "c_id", "lex_u", "rk"))
    val got = viaSql.collect().map(_.toSeq).toSet
    val expected = graft.operators.TextOps
      .impactSearchServe(queries, idx).collect().map(_.toSeq).toSet
    assert(got == expected && got.nonEmpty,
      "the SQL surface must return exactly the Scala serve's rows")

    // a parquet PATH as the query source works too (the '/' route)
    val qp = s"$root/q.parquet"
    queries.write.parquet(qp)
    assert(spark.sql(s"CALL graft_impact_search('$idx', '$qp')")
      .collect().map(_.toSeq).toSet == expected)

    // loud arg errors: wrong arity, a source without doc_id/text
    val arity = intercept[Exception](
      spark.sql(s"CALL graft_impact_search('$idx')"))
    assert(arity.getMessage.contains("graft_impact_search(indexPath"))
    Seq((1L, "x")).toDF("id", "body").createOrReplaceTempView("call_imp_bad")
    val cols = intercept[Exception](
      spark.sql(s"CALL graft_impact_build('call_imp_bad', '$root/idx2')"))
    assert(cols.getMessage.contains("doc_id and text"))
  }
}
