package graft.tools

import graft.model.{PayloadCodec, Tool}
import scala.util.Random

/** One-off extended fuzz: FastScan vs jackson equality across many
  * seeds (the in-suite fuzz pins one seed; this sweeps 40). Run via
  * `runMain graft.tools.FuzzMain`; not part of CI (time-boxed dev
  * tool, the suite's fixed-seed fuzz is the regression gate). */
object FuzzMain {
  def main(args: Array[String]): Unit = {
    val alphabet =
      "{}[]\",:0123456789.eE+-qtcwh lines rects col boxes\\u00d8\n\t truefalsn"
    var fails = 0
    for (seed <- 1 to 40) {
      val rnd = new Random(seed * 7919L)
      for (_ <- 0 until 4000) {
        val len = rnd.nextInt(90)
        val junk = "{" + Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
        val a = PayloadCodec.decode(junk)
        val b = PayloadCodec.decodeJackson(junk)
        if (a.boxes.toSeq != b.boxes.toSeq || a.lines.toSeq != b.lines.toSeq ||
            a.rects.toSeq != b.rects.toSeq || (a.w, a.h, a.col) != (b.w, b.h, b.col)) {
          fails += 1
          if (fails < 5) println(s"MISMATCH seed=$seed: ${junk.take(100)}")
        }
      }
      val corpus = graft.gen.TranscriptGen.corpus(nConvs = 3, seed = seed * 31L)
      val payloads = corpus.turns.filter(_.tool != Tool.HtmlMain).map(_.text).take(30)
      for (p <- payloads; _ <- 0 until 8) {
        val mutated =
          if (rnd.nextBoolean()) p.substring(0, rnd.nextInt(p.length))
          else {
            val pos = rnd.nextInt(p.length)
            p.substring(0, pos) + alphabet(rnd.nextInt(alphabet.length)) +
              p.substring(pos + 1)
          }
        val a = PayloadCodec.decode(mutated)
        val b = PayloadCodec.decodeJackson(mutated)
        if (a.boxes.toSeq != b.boxes.toSeq || (a.w, a.h, a.col) != (b.w, b.h, b.col)) {
          fails += 1
          if (fails < 5) println(s"MISMATCH mut seed=$seed: ${mutated.take(100)}")
        }
      }
    }
    println(s"fuzz done: $fails mismatches over 40 seeds x (4000 junk + 240 mutations)")
  }
}
