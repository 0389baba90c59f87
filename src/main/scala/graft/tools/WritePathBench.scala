package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase/variant profiler for the durable write path (the 13× gap
  * between scan-path extraction and the bucket-sorted dynamic-
  * overwrite write measured in round 3; the residual 3× gap between
  * the partitioned and flat writes targeted in round 5). Times, on
  * one session: extraction alone, shuffle+sort without a sink (noop),
  * and the partitioned parquet write under competing (partitioning,
  * sort-key, writer-config) formulations — so the dominating stage is
  * measured, not guessed. Each partitioned variant also reports its
  * OUTPUT FILE COUNT: the round-5 hypothesis is that hash-partitioning
  * on (bucket, conv_id) mixes every bucket into every task, so a
  * 64-task write emits ~64×64 files (each with its own parquet footer
  * and commit-time rename) where a bucket-contiguous range partition
  * emits ~64.
  *
  * Usage: runMain graft.tools.WritePathBench [corpusDir] [reps]
  */
object WritePathBench {
  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/graft_scale_corpus")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val turns = spark.read.parquet(s"$corpusDir/transcripts").as[graft.model.Turn]
    def extracted = {
      val m = new graft.pipeline.ExtractPipeline.Metrics(spark)
      graft.pipeline.ExtractPipeline.extract(turns, m, partitions = 0)
        .withColumn("bucket", graft.pipeline.ResumableExtract.bucketOf($"conv_id", 64))
    }
    def parquetFiles(dir: String): Long = {
      val d = new java.io.File(dir)
      if (!d.exists) -1
      else org.apache.commons.io.FileUtils
        .listFiles(d, Array("parquet"), true).size().toLong
    }
    def t(name: String, outDir: String = "")(f: => Unit): Unit = {
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      val files = if (outDir.isEmpty) "" else f" files=${parquetFiles(outDir)}%4d"
      println(f"[write-path] $name%-26s $best%6.1f s$files")
    }

    t("extract_only") { extracted.agg(count(lit(1))).head(): Unit }
    t("shuffle_sort_noop") {
      extracted.repartition($"bucket", $"conv_id")
        .sortWithinPartitions($"conv_id", $"turn_idx")
        .write.format("noop").mode("overwrite").save()
    }
    // round-4 production shape: hash(bucket, conv) → every task holds
    // rows of ~every bucket → tasks × buckets output files
    t("hash(bucket,conv)", "/tmp/wp_cur") {
      extracted.repartition($"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").partitionBy("bucket").parquet("/tmp/wp_cur")
    }
    // round-5 candidate: RANGE partition on (bucket, conv) keeps each
    // bucket contiguous — a task holds a run of whole buckets (a bucket
    // straddles at most one boundary), so file count ≈ partitions, and
    // the single-writer path crosses directories only at bucket edges.
    // Costs a sampling job that re-computes the extraction upstream.
    t("range(bucket,conv)", "/tmp/wp_rng") {
      extracted.repartitionByRange(64, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").partitionBy("bucket").parquet("/tmp/wp_rng")
    }
    // round-5 PRODUCTION shape (ResumableExtract): exact bucket→task
    // placement — bucket-contiguous like range, no sampling job, and
    // exactly 64 files — plus the per-column dictionary toggle below.
    t("exact(bucket)+ndt", "/tmp/wp_ex") {
      graft.pipeline.BucketLayout.exactRepartition(extracted, $"bucket", 64)
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite")
        .option("parquet.enable.dictionary#extracted_text", "false")
        .partitionBy("bucket").parquet("/tmp/wp_ex")
    }
    // writer-config probes on the range shape
    t("range_nodict", "/tmp/wp_nod") {
      extracted.repartitionByRange(64, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").option("parquet.enable.dictionary", "false")
        .partitionBy("bucket").parquet("/tmp/wp_nod")
    }
    t("range_rowgroup16m", "/tmp/wp_rg") {
      extracted.repartitionByRange(64, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").option("parquet.block.size", (16 << 20).toString)
        .partitionBy("bucket").parquet("/tmp/wp_rg")
    }
    // footer inspection shows extracted_text's dictionary is built,
    // overflows, and falls back to PLAIN mid-write (encodings
    // PLAIN_DICTIONARY + PLAIN in the same chunk) — the build is pure
    // wasted CPU for a high-cardinality column. Whole-file nodict
    // measured faster but +46% bytes (the low-cardinality columns DO
    // dictionary-compress); this disables it for the one doomed column.
    t("range_nodict_text", "/tmp/wp_ndt") {
      extracted.repartitionByRange(64, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite")
        .option("parquet.enable.dictionary#extracted_text", "false")
        .partitionBy("bucket").parquet("/tmp/wp_ndt")
    }
    // NOT retried: spark.sql.maxConcurrentOutputFileWriters=70 on the
    // hash shape (sorted only by (conv, turn)) measured 29.1 s — 70
    // open writers per task × 64 tasks thrash heap and parquet write
    // buffers; the sorted single-writer path is strictly better here.
    t("flat_nopartitionby", "/tmp/wp_flat") {
      extracted.repartition(64, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").parquet("/tmp/wp_flat")
    }
    spark.stop()
  }
}
