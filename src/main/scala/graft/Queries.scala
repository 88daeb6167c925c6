package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of every driver-checked query. Each entry demonstrates one
  * operator family from SURVEY.md §2 (or a scale extension) over the
  * driver-generated testdata; the paired oracle is DuckDB SQL on the same
  * parquet tables.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] =
    queries.Relational.all ++ queries.Pipeline.all

  def oracles: Map[String, String] =
    queries.Relational.oracles ++ queries.Pipeline.oracles
}
