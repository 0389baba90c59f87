package graft.bench

import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: per-rep extraction times across a cores curve, to
  * separate real scaling limits from measurement noise (GC, JIT,
  * page cache, scheduler). Usage:
  * runMain graft.bench.CurveBench <corpusDir> [coresCsv] [reps]
  */
object CurveBench {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val cores = args.lift(1).getOrElse("4,8,16,32").split(",").map(_.toInt)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    for (c <- cores) {
      val s = SparkSession.builder()
        .master(s"local[$c]")
        .appName(s"graft-curve-$c")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      import s.implicits._
      val turns = s.read.parquet(s"$corpusDir/transcripts").as[graft.model.Turn]
      val times = (1 to reps).map { r =>
        val m = new ExtractPipeline.Metrics(s)
        val t0 = System.nanoTime()
        val n = ExtractPipeline.extract(turns, m, partitions = 0)
          .agg(count(lit(1)), sum(length($"extracted_text"))).head().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[curve] cores=$c rep=$r sec=$sec%.2f tps=${n / sec}%.0f")
        sec
      }
      println(f"[curve] cores=$c best=${times.min}%.2f median=${times.sorted.apply(reps / 2)}%.2f")
      s.stop()
    }
  }
}
