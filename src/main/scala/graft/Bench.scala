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
    // The query-lifetime release registry (Fn.release) unpersists
    // locally-checkpointed blocks at every query boundary; RDD.unpersist
    // logs a per-block WARN for that EXPECTED transition, and those
    // lines were the first thing a reader of the r4 bench artifact saw.
    // Silence the rdd package in this main only — library code never
    // touches global log config. (setLogLevel above sets the ROOT
    // level, so this narrower logger setting survives it.)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    // Same treatment for WindowExec's single-partition WARN: the only
    // unpartitioned windows in the suite are deliberate global ranks
    // over vocab- or k-bounded intermediates (o6/t15/w5 — plan-pinned
    // in PlanShapeSpec), so the warning is expected there and only
    // dirties the artifact tail.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // And for the scheduler's "Broadcasting large task binary" WARN:
    // a handful of extraction/dedup stages legitimately close over
    // ~2-3 MiB of kernel tables, and the repeated notice is the last
    // thing printed before the JSON line. Real failures still surface
    // (ERROR level keeps stage-failure logging).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.ERROR)

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

    // ── single-thread host calibration, reported as `host_kernel_us`:
    // the bare kernel (no Spark) over a fixed 300-conv corpus, min
    // µs/turn across reps SPREAD over the bench window like the
    // extraction reps. BENCH/BASELINE.md records the quiet-host floor
    // (5.1 µs), so host_kernel_us/5.1 tells any reader how degraded
    // the host was DURING this artifact's run — this VM's CPU
    // availability swings 3-5× in multi-minute windows, and a bare
    // number cannot be interpreted without knowing the window. ──────
    val calibTurns = (0 until 300)
      .flatMap(c => graft.gen.TranscriptGen.convTurns(c)._1).toArray
    val calibCtr = new graft.kernel.Extractor.Counters
    val calibs = scala.collection.mutable.ArrayBuffer.empty[Double]
    def calibRep(record: Boolean): Unit = {
      val t0 = System.nanoTime(); var i = 0; var acc = 0L
      while (i < calibTurns.length) {
        val e = graft.kernel.Extractor.extract(calibTurns(i), calibCtr)
        acc += e.n_cells + e.extracted_text.length
        i += 1
      }
      val us = (System.nanoTime() - t0) * 1e-3 / calibTurns.length
      if (record && acc != 0) calibs += us
    }
    calibRep(record = false) // JIT warm-up, untimed
    def extractRep(record: Boolean): Unit = {
      val metrics = new graft.pipeline.ExtractPipeline.Metrics(spark)
      val t0 = System.nanoTime()
      graft.pipeline.ExtractPipeline.extract(turnsDs, metrics, partitions = 0)
        .agg(sum(length($"extracted_text")), sum($"n_cells")).head()
      if (record) extractTimes += (System.nanoTime() - t0) / 1e9
    }

    try {
      extractRep(record = false) // kernel/codegen warm-up, untimed

      // per-query MIN over reps, run CYCLE-MAJOR: cycle c times every
      // query once before any query sees rep c+1. This host's
      // CPU-steal windows last multiple minutes, so the r4 query-major
      // loop (3 back-to-back reps per query) could land one query's
      // entire rep set inside a single window and its min never reached
      // the floor (BENCH_r04 recorded j1_best_match at 7.68 s and d9 at
      // 7.83 s against adjudicated floors of 1.70 s / 2.01 s). Spreading
      // a query's reps ~minutes apart samples independent noise windows
      // — the same min-over-interleaved-cycles estimator ScalingBench
      // and the extraction headline already use (BENCH/BASELINE.md
      // methodology). A query whose EVERY rep throws reports -1 — a
      // failure must not masquerade as a (fast) plausible timing with
      // its only trace on stderr.
      val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
      val queries = SparkEntry.queries.toSeq.sortBy(_._1)

      // headline estimator: min over extraction reps SPREAD ACROSS THE
      // WHOLE BENCH RUN (one rep every `every` query slots across all
      // cycles), not back-to-back — same rationale as above; this is
      // the fix r4 applied to the headline, now sharing the cycle-major
      // sweep's full time span.
      val exReps = sys.env.getOrElse("GRAFT_BENCH_EXTRACT_REPS", "8").toInt
      val totalSlots = reps * queries.size
      val every = math.max(1, totalSlots / math.max(1, exReps - 1))

      val best = scala.collection.mutable.Map.empty[String, Double]
      var slot = 0
      for (_ <- 1 to reps; (name, fn) <- queries) {
        if (slot % every == 0 && extractTimes.size < exReps - 1) {
          extractRep(record = true)
          calibRep(record = true) // same spread as the headline reps
        }
        slot += 1
        val t0 = System.nanoTime()
        try {
          exhaust(fn(spark, sfDir))
          val sec = (System.nanoTime() - t0) / 1e9
          if (sec < best.getOrElse(name, Double.MaxValue)) best(name) = sec
        } catch {
          case e: Throwable => System.err.println(s"[bench] $name: $e")
        }
      }
      val results = queries.map { case (name, _) =>
        name -> best.getOrElse(name, -1.0)
      }
      extractRep(record = true) // final rep: one sample after the sweep
      calibRep(record = true)
      val extractSec = extractTimes.min
      val kernelUs = calibs.min

      val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      val total = f"${results.map(_._2).filter(_ >= 0).sum}%.3f"
      val tps = f"${nTurns / extractSec}%.1f"
      val es = f"$extractSec%.3f"
      val ku = f"$kernelUs%.2f"
      println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_turns":$nTurns,"extract_sec":$es,"turns_per_sec":$tps,"host_kernel_us":$ku}""")
    } finally // repeated bench runs must not accumulate temp corpora;
      // quiet delete: a cleanup IOException must not mask the
      // original failure from the timed body
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(corpusDir)): Unit
    spark.stop()
  }
}
