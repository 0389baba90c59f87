package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end durable-pipeline run: WriteCorpus output → full
  * ResumableExtract (extraction + salted repartition + per-bucket
  * dynamic-overwrite sorted parquet + lineage commit) → resume no-op
  * check. This is the write-path complement to ScalingBench's
  * scan-path throughput: the number includes the shuffle and the
  * durable sorted write (measured 10.0M turns in 28.6 s = 352k
  * turns/sec at local[32] on the 96000-conv corpus after the round-4
  * bucket-prefixed-sort and kernel fixes — see WritePathBench and
  * BENCH/BASELINE.md; scan-only extraction on the same host does
  * ~1.8M turns/sec).
  *
  * Usage: runMain graft.tools.EndToEnd [corpusDir] [outDir] [nBuckets] [filesPerBucket]
  */
object EndToEnd {
  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/graft_scale_corpus")
    val out = args.lift(1).getOrElse("/tmp/graft_endtoend")
    val nBuckets = args.lift(2).map(_.toInt).getOrElse(64)
    val filesPerBucket = args.lift(3).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val turns = spark.read.parquet(s"$corpusDir/transcripts").as[graft.model.Turn]
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val t0 = System.nanoTime()
    val done = graft.pipeline.ResumableExtract.run(spark, turns, out, nBuckets,
      filesPerBucket = filesPerBucket)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[end-to-end] buckets=${done.size} sec=$sec%.1f")
    val t1 = System.nanoTime()
    val again = graft.pipeline.ResumableExtract.run(spark, turns, out, nBuckets,
      filesPerBucket = filesPerBucket)
    println(f"[end-to-end] resume no-op buckets=${again.size} sec=${(System.nanoTime() - t1) / 1e9}%.1f")
    val data = spark.read.parquet(s"$out/data")
    val n = data.count()
    println(s"[end-to-end] rows=$n lineageRows=${spark.read.parquet(s"$out/lineage").count()} " +
      s"cells=${data.agg(sum($"n_cells")).head().getLong(0)} turns_per_sec=${(n / sec).toLong}")
    spark.stop()
  }
}
