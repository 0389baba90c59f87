package graft.bench

import graft.gen.TranscriptGen
import graft.kernel.Extractor
import graft.model.PayloadCodec

/** Plain-JVM (no Spark) microbench of the per-turn kernel: isolates
  * kernel cost from Spark scan/encode overhead so optimization effort
  * goes where the time is.
  * Usage: runMain graft.bench.KernelBench [nConvs] [reps]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(2000)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val turns = (0 until nConvs).flatMap(c => TranscriptGen.convTurns(c)._1).toArray
    println(s"[kernel-bench] ${turns.length} turns")
    val ctr = new Extractor.Counters
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      var i = 0
      var acc = 0L
      while (i < turns.length) {
        val e = Extractor.extract(turns(i), ctr)
        acc += e.n_cells + e.extracted_text.length
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[kernel-bench] rep=$r sec=$sec%.2f tps=${turns.length / sec}%.0f us/turn=${sec * 1e6 / turns.length}%.1f (acc=$acc)")
    }
    // parse-only share
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      var i = 0
      var acc = 0L
      while (i < turns.length) {
        acc += PayloadCodec.decode(turns(i).text).boxes.length
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[kernel-bench] parse-only rep=$r sec=$sec%.2f us/turn=${sec * 1e6 / turns.length}%.1f (boxes=$acc)")
    }
  }
}
