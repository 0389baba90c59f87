package graft.pipeline

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Idempotent, resumable extraction runs (SURVEY §4.3).
  *
  * The reference's only cross-request state is one scalar high-water
  * mark written back after each submit (backend/main.py:607-636).
  * Generalized here to per-bucket lineage rows: conversations are
  * hashed into `nBuckets` stable buckets; a run processes only
  * buckets with no lineage row, writes each bucket's output under
  * `out/data/bucket=K/` with dynamic partition overwrite (so a crashed
  * run's partial bucket is cleanly rewritten), and only then appends
  * lineage rows for the completed buckets. Crash between the two
  * writes ⇒ bucket re-runs next time ⇒ same bytes (extraction is
  * deterministic) — idempotent resume.
  *
  * Storage goes through the [[TableIO]] trait (SURVEY §7 step 3):
  * [[ParquetTableIO]] here (no Iceberg jar offline); on a cluster
  * [[IcebergTableIO]] collapses the two writes into one snapshot
  * transaction and these resume semantics carry over unchanged.
  *
  * Scale note: bucketing by conv-hash keeps resume units coarse
  * (10^12 turns / e.g. 1024 buckets ≈ 10^9 turns per unit) while the
  * inner job still salt-repartitions within the selected buckets, so
  * skew handling is unchanged.
  */
final class LineageStore(io: TableIO) {

  def this(outDir: String) = this(new ParquetTableIO(outDir))

  def completedBuckets(spark: SparkSession): Set[Int] =
    io.readIfExists(spark, LineageStore.LineageTable) match {
      case None => Set.empty
      case Some(df) =>
        import spark.implicits._
        df.select("partition_id").as[Int].collect().toSet
    }

  def appendLineage(rows: DataFrame): Unit =
    io.append(rows, LineageStore.LineageTable)

  def writeData(df: DataFrame): Unit =
    io.overwritePartitions(df, LineageStore.DataTable, "bucket")

  def readData(spark: SparkSession): DataFrame =
    io.read(spark, LineageStore.DataTable)
}

object LineageStore {
  val DataTable = "data"
  val LineageTable = "lineage"
}

object ResumableExtract {

  def bucketOf(convId: org.apache.spark.sql.Column, nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(convId), lit(nBuckets.toLong)).cast("int")

  /** Run (or resume) an extraction over `turns`, writing
    * `ExtractedTurn` rows partitioned by bucket. Returns the set of
    * buckets processed in THIS invocation (empty ⇒ nothing pending).
    */
  def run(
      spark: SparkSession,
      turns: Dataset[Turn],
      outDir: String,
      nBuckets: Int = 16,
      partitions: Int = 0,
      runId: String = "run"): Set[Int] =
    run(spark, turns, new ParquetTableIO(outDir), nBuckets, partitions, runId)

  /** Same run/resume protocol through any [[TableIO]] — this is the
    * entry the cluster uses with [[IcebergTableIO]] (snapshot commits
    * instead of the parquet two-write protocol). */
  def run(
      spark: SparkSession,
      turns: Dataset[Turn],
      io: TableIO,
      nBuckets: Int,
      partitions: Int,
      runId: String): Set[Int] = {
    import spark.implicits._
    val store = new LineageStore(io)
    val done = store.completedBuckets(spark)
    val pending = (0 until nBuckets).filterNot(done).toSet
    if (pending.isEmpty) return Set.empty

    val metrics = new ExtractPipeline.Metrics(spark)
    val withBucket = turns
      .withColumn("bucket", bucketOf($"conv_id", nBuckets))
      .filter($"bucket".isin(pending.toSeq: _*))
      .drop("bucket")
      .as[Turn]

    val extracted = ExtractPipeline
      .extract(withBucket, metrics, partitions = partitions)
      .withColumn("bucket", bucketOf($"conv_id", nBuckets))

    // dynamic overwrite: only the pending buckets' partitions are
    // replaced; completed buckets' data is untouched. The sort is
    // PREFIXED WITH THE PARTITION COLUMN on purpose: a partitioned
    // file write requires its input clustered by the partition column
    // — when the incoming ordering doesn't start with it, the writer
    // abandons the single-writer path (re-sorting / holding one open
    // writer per partition value per task), which measured 3.6× slower
    // on the 2.5M-turn corpus (42.6 s vs 11.8 s, WritePathBench).
    // Within each bucket the (conv_id, turn_idx) W2 layout is
    // unchanged.
    store.writeData(
      extracted
        .repartition($"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx"))

    // lineage rows from the data just written (cheap agg over the
    // pending buckets only) — committed strictly after the data
    val now = new Timestamp(System.currentTimeMillis())
    val lineage = store.readData(spark)
      .filter(col("bucket").isin(pending.toSeq: _*))
      .groupBy($"bucket")
      .agg(
        min($"conv_id").as("conv_min"),
        max($"conv_id").as("conv_max"),
        count(lit(1)).as("turns_done"),
        sum($"n_cells").cast("long").as("cells_emitted"),
        // derived from the bucket's own written rows (NOT the run-wide
        // accumulator, which spans all pending buckets and can
        // double-count under task retries)
        sum($"n_dropped").cast("long").as("boxes_dropped"))
      .select(
        lit(runId).as("run_id"),
        $"bucket".as("partition_id"),
        $"conv_min", $"conv_max", $"turns_done", $"cells_emitted",
        $"boxes_dropped",
        lit(now).as("completed_at"))
    // buckets with zero turns still need a lineage row
    val present = lineage.select("partition_id").as[Int].collect().toSet
    val emptyBuckets = (pending -- present).toSeq
    val emptyRows = emptyBuckets.map(b =>
      (runId, b, "", "", 0L, 0L, 0L, now)).toDF(
      "run_id", "partition_id", "conv_min", "conv_max",
      "turns_done", "cells_emitted", "boxes_dropped", "completed_at")
    store.appendLineage(lineage.unionByName(emptyRows))
    pending
  }

  /** Read the (complete) extracted output of prior runs. */
  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    new LineageStore(outDir).readData(spark)
}
