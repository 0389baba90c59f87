package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage abstraction the resumable pipeline writes through
  * (SURVEY §7 step 3). The engine's contract is logical tables —
  * `data` (extracted turns, partitioned by resume bucket) and
  * `lineage` (per-bucket checkpoint rows) — not paths.
  *
  *  - [[ParquetTableIO]] is the sandbox implementation (no Iceberg jar
  *    offline): dynamic partition overwrite + append, with the
  *    two-write crash protocol ResumableExtract documents.
  *  - On a cluster the Iceberg implementation replaces it 1:1: both
  *    writes collapse into one snapshot-transactional commit
  *    (`df.writeTo(table).overwritePartitions()` and a metadata
  *    append in the same transaction), and `readLineage` becomes a
  *    snapshot read — the resume semantics above survive unchanged
  *    because they only rely on "lineage row visible ⇒ bucket data
  *    complete", which a snapshot commit gives for free.
  */
trait TableIO {
  /** read a logical table; empty-schema None when it does not exist yet */
  def readIfExists(spark: SparkSession, table: String): Option[DataFrame]
  def read(spark: SparkSession, table: String): DataFrame
  def append(df: DataFrame, table: String): Unit
  /** replace only the partitions present in `df` (dynamic overwrite) */
  def overwritePartitions(df: DataFrame, table: String, partitionCol: String): Unit
}

/** Parquet-directory implementation rooted at `root`; table `t` lives
  * at `root/t`. */
final class ParquetTableIO(root: String) extends TableIO {

  def path(table: String): String = s"$root/$table"

  def readIfExists(spark: SparkSession, table: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path(table))) else None
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table))

  def overwritePartitions(df: DataFrame, table: String, partitionCol: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      df.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCol)
        .parquet(path(table))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
