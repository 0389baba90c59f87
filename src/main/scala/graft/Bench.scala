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

    // ── headline corpus, prepared up front so extraction reps can be
    // INTERLEAVED with the query reps (see below). 24000 convs ≈ 2.5M
    // turns (matches the scaling bench): the 5000-conv r2 corpus
    // scanned as one task wave at local[32], so it measured the
    // slowest straggler, not saturated throughput. The corpus is
    // WRITTEN TO PARQUET first (generation + write untimed) so the
    // timed job has the production shape — parquet scan →
    // mapPartitions kernel — matching ScalingBench/BASELINE.md.
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_bench_corpus").toString
    graft.gen.WriteCorpus.write(spark, corpusDir,
      sys.props.getOrElse("graft.bench.convs", "24000").toInt)
    import spark.implicits._
    val turnsDs = spark.read.parquet(s"$corpusDir/transcripts")
      .as[graft.model.Turn]
    val nTurns = turnsDs.count()
    val extractTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def extractRep(record: Boolean): Unit = {
      val metrics = new graft.pipeline.ExtractPipeline.Metrics(spark)
      val t0 = System.nanoTime()
      graft.pipeline.ExtractPipeline.extract(turnsDs, metrics, partitions = 0)
        .agg(sum(length($"extracted_text")), sum($"n_cells")).head()
      if (record) extractTimes += (System.nanoTime() - t0) / 1e9
    }

    try {
      extractRep(record = false) // kernel/codegen warm-up, untimed

      // per-query MIN over reps: this host's available CPU swings 3-5×
      // in multi-minute windows and noise only ever ADDS time, so a
      // single-shot timing is unreadable (the r1→r2 per-query deltas
      // were mostly host noise). A query whose EVERY rep throws
      // reports -1 — a failure must not masquerade as a (fast)
      // plausible timing with its only trace on stderr.
      val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
      val queries = SparkEntry.queries.toSeq.sortBy(_._1)

      // headline estimator: min over extraction reps SPREAD ACROSS THE
      // WHOLE BENCH RUN, not back-to-back. This host's CPU-steal
      // windows last multiple minutes — 5 consecutive ~secs reps can
      // sit entirely inside one window and the min never reaches the
      // floor (BENCH_r03 recorded 79k turns/sec for an engine whose
      // interleaved floor is ~1.5M/s). Interleaving one rep every few
      // queries samples the same set of noise windows the ~minutes-long
      // query sweep spans — the min-over-interleaved-cycles estimator
      // ScalingBench already uses (BENCH/BASELINE.md methodology).
      val exReps = sys.env.getOrElse("GRAFT_BENCH_EXTRACT_REPS", "8").toInt
      val every = math.max(1, queries.size / math.max(1, exReps - 1))

      val results = queries.zipWithIndex.map { case ((name, fn), i) =>
        if (i % every == 0 && extractTimes.size < exReps - 1) extractRep(record = true)
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            exhaust(fn(spark, sfDir))
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable => System.err.println(s"[bench] $name: $e"); None
          }
        }
        name -> (if (times.isEmpty) -1.0 else times.min)
      }
      extractRep(record = true) // final rep: one sample after the sweep
      val extractSec = extractTimes.min

      val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      val total = f"${results.map(_._2).filter(_ >= 0).sum}%.3f"
      val tps = f"${nTurns / extractSec}%.1f"
      val es = f"$extractSec%.3f"
      println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_turns":$nTurns,"extract_sec":$es,"turns_per_sec":$tps}""")
    } finally // repeated bench runs must not accumulate temp corpora;
      // quiet delete: a cleanup IOException must not mask the
      // original failure from the timed body
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(corpusDir)): Unit
    spark.stop()
  }
}
