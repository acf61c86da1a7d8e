package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator family from SURVEY.md §2.B: named DataFrame queries plus
  * (where SQL-expressible) their DuckDB oracle twins. `SparkEntry`
  * aggregates all modules; the driver verifies each pair (SURVEY.md §5.2).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
