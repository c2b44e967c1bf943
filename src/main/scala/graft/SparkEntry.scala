package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-area registries; every entry with an
  * oracle is hash-checked against DuckDB at sf0.01. */
object SparkEntry {

  def registries: Seq[QueryDef] =
    RelationalQueries.defs ++ GraphQueries.defs ++ GraphQueries2.defs ++
      OlapQueries.defs ++ OlapQueries2.defs ++ DocQueries.defs ++
      DocQueries2.defs ++ DocQueries3.defs ++ EventQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * 3-hop kneighbor over the TPC-H property-graph projection. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_kneighbor")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(q => q.name -> q.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline bench subset (Bench.scala). */
  def benchQueries: Seq[String] = registries.filter(_.bench).map(_.name)
}
