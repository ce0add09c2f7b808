package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of operator queries plus their DuckDB oracle SQL.
  *
  * Contract (SURVEY.md §2): every `oracle=yes` operator ships as one
  * entry in `queries` AND one in `oracle` under the same key, with
  * identical output column names and a total ORDER BY so the driver's
  * hash-compare is deterministic. Non-SQL-expressible operators appear
  * in `queries` only (driver records a rows-only check).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Seq[(String, Q)]
  def oracle: Seq[(String, String)]
}
