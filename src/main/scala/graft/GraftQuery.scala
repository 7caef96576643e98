package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver's verification contract.
  *
  * @param run    builds the DataFrame for a given testdata directory
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None
  *               for operators whose semantics are not SQL-expressible
  *               (greedy/sequential algorithms, tensor math, hashing-based
  *               near-dup) — the driver then records a rows-only check.
  *
  * Conventions that make the hash compare deterministic across engines:
  *   - every computed column is aliased identically on both sides;
  *   - floating-point aggregates are rounded (HALF_UP == DuckDB's
  *     round-half-away-from-zero for our all-positive and negative cases);
  *   - every result carries an ORDER BY on a unique key.
  */
final case class GraftQuery(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryPack {
  def queries: Map[String, GraftQuery]
}
