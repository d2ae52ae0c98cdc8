package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a named DataFrame query over a scale-factor
  * directory plus (when SQL-expressible) its ANSI-SQL oracle twin for the
  * driver's DuckDB compare. Operator modules expose `ops: Seq[Op]`;
  * SparkEntry aggregates them (SURVEY.md §5 test strategy).
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
