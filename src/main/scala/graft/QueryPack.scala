package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object QueryPack {
  /** Driver-contract query shape: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame
}

/** A module of driver-checkable queries. `queries` keys ⊇ `oracleSql` keys;
  * queries without an oracle entry get the driver's weaker rows-only check
  * (used for ops not expressible in DuckDB SQL: ML training, MinHash LSH, …).
  *
  * Oracle-parity rules (see SURVEY.md §5):
  *  - every ORDER BY carries a unique trailing key (ties are engine-unstable);
  *  - numeric outputs are BIGINT (counts) or DOUBLE computed via exact
  *    decimal/int math where possible, else round(x, 6);
  *  - timestamps are emitted as formatted strings (arrow tz-encoding differs
  *    between Spark parquet output and DuckDB in-memory results).
  */
trait QueryPack {
  def queries: Map[String, QueryPack.Q]
  def oracleSql: Map[String, String]
}
