package graft

import graft.operators.{Dedup, Extraction, Multimodal, Relational, Retrieval, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * `queries` carries one entry per implemented operator from
  * SURVEY.md §2 plus the training-data-pipeline operators (dedup,
  * similarity search, text analysis) and the flagship transcript
  * extraction queries. `oracleSql` carries a DuckDB-equivalent SQL
  * for every entry with a driver oracle — including the extraction
  * kernel paths and the full BOM dataflow, which run the REAL
  * pipeline over corpora regenerable in SQL (Extraction.SqlCorpus).
  * Only the TranscriptGen-based synthetic-corpus queries stay
  * rows-only (gated by the in-repo per-turn equality suite).
  *
  * ==Cache-lifetime contract (one query at a time)==
  * Starting any query releases every cached/locally-checkpointed block
  * the PREVIOUS query registered (`Fn.release`), and local checkpoints
  * have truncated lineage — they cannot be recomputed once freed. So a
  * returned DataFrame is valid to consume only UNTIL the next
  * `queries(...)` invocation on the same session; consuming it later
  * fails with Spark's "cannot be recomputed after unpersisting" error,
  * not a wrong answer. Callers that need two query results live at
  * once must materialize (collect/write) the first before starting the
  * second — the one-at-a-time shape Verify, Bench, and production
  * batch jobs already have.
  */
object SparkEntry {

  // every query frees the PREVIOUS query's cached/checkpointed blocks
  // on entry (Fn.release) — executor storage returns to baseline
  // between queries instead of accumulating until eviction pressure;
  // a query's result stays valid until the next query begins
  private val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    (Relational.defs ++ Dedup.defs ++ Similarity.defs ++ TextAnalysis.defs ++
      Multimodal.defs ++ Retrieval.defs ++ Extraction.defs).map { case (name, fn, sql) =>
      (name,
        (s: SparkSession, d: String) => { graft.operators.Fn.release(); fn(s, d) },
        sql)
    }

  /** Flagship query on sf=0.001 inputs; driver smoke-checks rows>0.
    * The flagship is the north-rule pipeline itself: per-turn
    * extraction over the deterministic synthetic transcript corpus. */
  def entry(spark: SparkSession): DataFrame = Extraction.extractAll(spark)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, fn, _) => name -> fn }.toMap

  def oracleSql: Map[String, String] =
    all.collect { case (name, _, Some(sql)) => name -> sql.trim }.toMap
}
