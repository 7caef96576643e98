package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator pack's queries into one registry. Each key is
  * one operator from SURVEY.md §2's inventory; keys with a DuckDB oracle
  * get hash-checked at sf0.01, oracle-less keys (sequential/tensor/hash
  * algorithms) get a rows-only check.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    operators.Aggregates,
    operators.Joins,
    operators.TpchExtras,
    operators.Windows,
    operators.Reshape,
    operators.Dedup,
    operators.Similarity,
    operators.TextAnalysis,
    operators.Multimodal,
    operators.SpectralExtras,
    operators.ScaleOps,
    operators.GraphOps,
    ms.MsPipeline,
    streaming.EventStreams,
    streaming.DocStreams,
    functions.Scalars,
  )

  private lazy val registry: Map[String, GraftQuery] =
    packs.flatMap(_.queries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q_agg_pricing_summary").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, GraftQuery(_, Some(sql))) =>
      k -> sql.trim
    }
}
