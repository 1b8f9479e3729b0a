package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based ingest validation — the reference's Pydantic model gate
  * (finnoio/jobhouse src/common/data.py:6 RawJobPosting: required
  * posting_id/raw_content/source/extracted_at, raw_content a JSON
  * object) as declarative Column predicates evaluated in one codegen'd
  * scan. Invalid rows are QUARANTINED with the names of the rules they
  * broke, never silently dropped (you can't fix an ingest bug you can't
  * see) and never silently landed (a null key poisons every downstream
  * join).
  */
object Validate {

  val ViolationsCol = "_violations"

  /** Annotate each row with the rules it violates (empty array = valid).
    * A rule whose predicate evaluates to NULL (null inputs, usually)
    * counts as violated — validation must fail closed.
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "validate: no rules")
    require(rules.map(_._1).distinct.size == rules.size, "validate: duplicate rule names")
    require(!df.columns.contains(ViolationsCol),
      s"validate: input already carries $ViolationsCol")
    val marks = rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn(ViolationsCol, array_compact(array(marks: _*)))
  }

  /** Split into (valid — original schema, quarantined — plus the
    * violations column). One scan feeding two frames; at 100 TB each
    * side is its own pushdown-friendly filter over the annotated scan.
    */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val annotated = check(df, rules)
    (annotated.filter(size(col(ViolationsCol)) === 0).drop(ViolationsCol),
      annotated.filter(size(col(ViolationsCol)) > 0))
  }

  /** The reference's RawJobPosting contract for the bronze landing shape
    * (posting_id STRING, raw_content STRING, source STRING,
    * extracted_at TIMESTAMP): required fields present and non-blank,
    * raw_content parseable as a JSON OBJECT (not a bare scalar/array —
    * the model types it as a dict).
    */
  val rawPostingRules: Seq[(String, Column)] = Seq(
    "posting_id_missing" -> (col("posting_id").isNotNull &&
      length(trim(col("posting_id"))) > 0),
    "source_missing" -> (col("source").isNotNull &&
      length(trim(col("source"))) > 0),
    "extracted_at_missing" -> col("extracted_at").isNotNull,
    "raw_content_not_json_object" -> (col("raw_content").isNotNull &&
      expr("try_parse_json(raw_content)").isNotNull &&
      startswith(ltrim(col("raw_content")), lit("{"))))
}
