package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query end-to-end on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Also reports the
  * north-rule headline — transcript-extraction throughput (turns/sec)
  * — as extra top-level fields (`extract_turns`, `extract_sec`,
  * `turns_per_sec`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // split sizing so scans produce >=2 task waves at local[32]
      // instead of one wave whose slowest straggler sets wall clock
      // (same fix as ScalingBench; see BENCH/BASELINE.md round-3 note)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // force full computation (count() alone could prune work)
    def exhaust(df: org.apache.spark.sql.DataFrame): Long = {
      val h = xxhash64(df.columns.map(c => col(c).cast("string")): _*)
      df.select(h.as("h")).agg(expr("bit_xor(h)"), count(lit(1))).head().getLong(1)
    }

    // untimed warmup: session machinery (parquet reader, codegen,
    // shuffle, broadcast) otherwise lands on whichever query sorts
    // first — a2 read 6.2 s in-bench vs 0.84 s isolated
    try exhaust(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case _: Throwable => () }

    // per-query MIN over reps: this host's available CPU swings 3-5×
    // in multi-minute windows and noise only ever ADDS time, so a
    // single-shot timing is unreadable (the r1→r2 per-query deltas
    // were mostly host noise). Same estimator as the scaling bench.
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try exhaust(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }

    // headline: extraction throughput on the synthetic transcript
    // corpus. 24000 convs ≈ 2.5M turns (matches the scaling bench):
    // the 5000-conv r2 corpus scanned as one task wave at local[32],
    // so the headline measured the slowest straggler, not saturated
    // throughput (805k vs 1.5M turns/sec on the same build). The
    // corpus is WRITTEN TO PARQUET first (generation + write untimed)
    // so the timed job has the production shape — parquet scan →
    // mapPartitions kernel — matching ScalingBench/BASELINE.md.
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_bench_corpus").toString
    val (nTurns, extractSec) =
      try {
        graft.gen.WriteCorpus.write(spark, corpusDir,
          sys.props.getOrElse("graft.bench.convs", "24000").toInt)
        import spark.implicits._
        val turnsDs = spark.read.parquet(s"$corpusDir/transcripts")
          .as[graft.model.Turn]
        val n = turnsDs.count()
        // min over reps (1 warm-up + 4 timed): the sandbox host's
        // available CPU fluctuates, and noise only ever adds time (see
        // BENCH/BASELINE.md methodology)
        val sec = (0 to 4).map { _ =>
          val metrics = new graft.pipeline.ExtractPipeline.Metrics(spark)
          val t0 = System.nanoTime()
          graft.pipeline.ExtractPipeline.extract(turnsDs, metrics, partitions = 0)
            .agg(sum(length($"extracted_text")), sum($"n_cells")).head()
          (System.nanoTime() - t0) / 1e9
        }.drop(1).min
        (n, sec)
      } finally // repeated bench runs must not accumulate temp corpora;
        // quiet delete: a cleanup IOException must not mask the
        // original failure from the timed body
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(corpusDir)): Unit

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    val tps = f"${nTurns / extractSec}%.1f"
    val es = f"$extractSec%.3f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_turns":$nTurns,"extract_sec":$es,"turns_per_sec":$tps}""")
    spark.stop()
  }
}
