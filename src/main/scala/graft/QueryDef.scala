package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exercise: a Spark query plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  *
  * Oracle-parity rules every QueryDef must follow (both sides):
  *  - alias every computed column to the same name,
  *  - deterministic ORDER BY (unique tiebreaker) since row order is hashed,
  *  - no raw timestamp columns in output (cast to DATE or format as string;
  *    Spark writes timestamps as UTC-adjusted, DuckDB returns naive),
  *  - round float aggregates (summation order differs between engines),
  *  - cast integer SUMs to BIGINT in DuckDB (it widens to HUGEINT).
  *
  * `headline` marks queries included in the Bench timing run.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
