package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each pack contributes `GQuery`s (Spark plan + DuckDB oracle); this object
  * flattens them into the driver's `queries`/`oracleSql` maps.
  */
object SparkEntry {

  /** All engine queries, in SURVEY §2 order. */
  def allQueries: Seq[GQuery] =
    Relational.all ++ TextOps.all ++ Dedup.all ++ Similarity.all ++
      RegistryOps.all ++ EventOps.all ++ Multimodal.all ++ Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
