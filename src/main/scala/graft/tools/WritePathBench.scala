package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase/variant profiler for the durable write path (the 13× gap
  * between scan-path extraction and the bucket-sorted dynamic-
  * overwrite write measured in round 3). Times, on one session:
  * extraction alone, shuffle+sort without a sink (noop), and the
  * partitioned parquet write under competing (repartition, sort-key,
  * codec) formulations — so the dominating stage is measured, not
  * guessed.
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
    def t(name: String)(f: => Unit): Unit = {
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[write-path] $name%-24s $best%6.1f s")
    }

    t("extract_only") { extracted.agg(count(lit(1))).head(): Unit }
    t("shuffle_sort_noop") {
      extracted.repartition($"bucket", $"conv_id")
        .sortWithinPartitions($"conv_id", $"turn_idx")
        .write.format("noop").mode("overwrite").save()
    }
    t("current(convsort)") {
      extracted.repartition($"bucket", $"conv_id")
        .sortWithinPartitions($"conv_id", $"turn_idx")
        .write.mode("overwrite").partitionBy("bucket").parquet("/tmp/wp_cur")
    }
    t("bucketsort64") {
      extracted.repartition(64, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").partitionBy("bucket").parquet("/tmp/wp_bs")
    }
    t("bucketsort128") {
      extracted.repartition(128, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").partitionBy("bucket").parquet("/tmp/wp_bs128")
    }
    t("bucketsort64_lz4") {
      extracted.repartition(64, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").option("compression", "lz4")
        .partitionBy("bucket").parquet("/tmp/wp_lz4")
    }
    t("flat_nopartitionby") {
      extracted.repartition(64, $"bucket", $"conv_id")
        .sortWithinPartitions($"bucket", $"conv_id", $"turn_idx")
        .write.mode("overwrite").parquet("/tmp/wp_flat")
    }
    spark.stop()
  }
}
