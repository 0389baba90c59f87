package graft.gen

import graft.model._
import java.sql.Timestamp
import scala.util.Random

/** Deterministic synthetic transcript corpus (FIXTURES.md §1, seed 42).
  * No external data: everything is synthesized from the seed. The
  * corpus exercises every reference edge case pinned in FIXTURES.md
  * (empty boxes, diameter tokens, equal-y ties, cluster drift,
  * fallbacks, rect-edge midpoints, …) plus skewed conversation
  * lengths for the salting/scaling tests.
  */
object TranscriptGen {

  val Seed = 42L
  private val BaseTs = 1767225600000L // 2026-01-01T00:00:00Z

  private val vocab = Array(
    "PLATE", "BRACKET", "SHAFT", "M8", "BOLT", "NUT-12", "GASKET",
    "O1234", "O9", " O12", "FLANGE", "SS304", "EN8", "QTY", "2", "10",
    "WASHER", "PIN", "COVER", "HOUSING", "SEAL", "BEARING", "Ø45",
    "DWG-100", "DWG-200", "REV-A", "", "  ", "O 12", "XO1")

  private val roles = Array("user", "assistant", "tool")

  final case class Corpus(
      turns: Seq[Turn],
      drawings: Seq[Drawing],
      convMeta: Seq[ConvMeta])

  final case class ConvMeta(conv_id: String, project: String,
                            part_number: String, last_item: Long)

  /** Per-conversation deterministic generation: the RNG is seeded
    * from (seed, convSeq) alone, so any subset of conversations can
    * be generated on any executor in any order and yield identical
    * rows — the property that lets the corpus scale out (the 10^12-
    * turn corpus is "generated where it is read", never shipped). */
  /** Conversation metadata is a pure function of the sequence number
    * (no turn generation needed). */
  def convMeta(convSeq: Int): ConvMeta =
    ConvMeta(f"conv-$convSeq%06d", s"proj${convSeq % 5}", s"part${convSeq % 11}",
      (convSeq % 37).toLong)

  def convTurns(convSeq: Int, seed: Long = Seed): (Seq[Turn], ConvMeta) = {
    val rnd = new Random(seed ^ (convSeq.toLong * 0x9E3779B97F4A7C15L))
    val turns = Seq.newBuilder[Turn]
    val cid = f"conv-$convSeq%06d"
    val meta = convMeta(convSeq)
    locally {
      val r = rnd.nextDouble()
      val nTurns =
        if (r < 0.90) 1 + rnd.nextInt(20)
        else if (r < 0.99) 150 + rnd.nextInt(100)
        else 5000 + rnd.nextInt(5000)
      val isBom = convSeq % 7 == 3 // ~14% of convs carry a BOM table
      var ti = 0
      if (isBom) {
        // 4 column-upload turns (PartNumber may be a drawing-number-ish
        // token to exercise J1 exact/prefix/substring outcomes)
        val labels = Seq("PartNumber", "Quantity", "Description", "Material")
        val nRows = 1 + rnd.nextInt(6)
        for (label <- labels) {
          // ragged columns: some shorter than nRows (J2 padding)
          val len = math.max(1, nRows - (if (rnd.nextDouble() < 0.3) rnd.nextInt(2) else 0))
          val boxes = (0 until len).map { row =>
            val t = label match {
              case "PartNumber"  => partToken(rnd)
              case "Quantity"    => qtyToken(rnd)
              case "Description" => vocab(rnd.nextInt(vocab.length))
              case "Material"    => if (rnd.nextBoolean()) "SS304" else "EN8"
            }
            mkBox(rnd, x = 10 + rnd.nextInt(50), y = 20 + row * 40, t = t,
              c = conf(rnd))
          }.toArray
          val pl = Payload(boxes, 800, 600, Array.empty, Array.empty, label)
          turns += Turn(cid, ti, "tool", PayloadCodec.encode(pl),
            Tool.TableSimple, ts(convSeq, ti))
          ti += 1
        }
      }
      while (ti < nTurns) {
        val tool = pickTool(rnd)
        val text = tool match {
          case Tool.HtmlMain => htmlPayload(rnd)
          case _             => PayloadCodec.encode(boxPayload(rnd, tool))
        }
        turns += Turn(cid, ti, roles(rnd.nextInt(3)), text, tool, ts(convSeq, ti))
        ti += 1
      }
    }
    (turns.result(), meta)
  }

  /** In-memory corpus (test tiers). Turn order is deterministically
    * shuffled so nothing downstream can rely on input order. */
  def corpus(nConvs: Int, seed: Long = Seed): Corpus = {
    val turns = Seq.newBuilder[Turn]
    val meta = Seq.newBuilder[ConvMeta]

    // handcrafted edge-case conversations first (stable conv_ids)
    val edge = edgeCaseTurns()
    turns ++= edge
    edge.map(_.conv_id).distinct.foreach { cid =>
      meta += ConvMeta(cid, "projE", "partE", 0L)
    }

    var convSeq = 0
    while (convSeq < nConvs) {
      val (t, m) = convTurns(convSeq, seed)
      turns ++= t
      meta += m
      convSeq += 1
    }
    val shuffled = new Random(seed ^ 0x5DEECE66DL).shuffle(turns.result())
    Corpus(shuffled, drawingsDict(), meta.result())
  }

  private def ts(convSeq: Int, turnIdx: Int): Timestamp =
    new Timestamp(BaseTs + convSeq * 3600000L + turnIdx * 1000L)

  private def conf(rnd: Random): Double =
    math.rint((0.5 + rnd.nextDouble() * 0.5) * 100) / 100.0 // 0.50-1.00, 2dp

  private def pickTool(rnd: Random): String = {
    val r = rnd.nextDouble()
    if (r < 0.30) Tool.Quick
    else if (r < 0.45) Tool.TableSimple
    else if (r < 0.65) Tool.TableBands
    else if (r < 0.85) Tool.TableRects
    else Tool.HtmlMain
  }

  private def mkBox(rnd: Random, x: Int, y: Int, t: String, c: Double): Box = {
    val w = 20 + rnd.nextInt(60)
    val h = 14 + rnd.nextInt(12)
    Box(x, y, x + w, y, x + w, y + h, x, y + h, t, c)
  }

  private def partToken(rnd: Random): String = {
    // mix of exact dict hits, prefixes-of-dict, dict-substrings, misses
    val opts = Array("DWG-100", "DWG-2", "WG-10", "PART-X", "DWG-300",
      "dwg-100", "AB-1", "ZZZ")
    opts(rnd.nextInt(opts.length))
  }

  private def qtyToken(rnd: Random): String = {
    val opts = Array("1", "2", "10", "12", "1 2", "12a", "", "007")
    opts(rnd.nextInt(opts.length))
  }

  /** random word-box payload for the quick/table paths */
  private def boxPayload(rnd: Random, tool: String): Payload = {
    val w = 600 + rnd.nextInt(600)
    val h = 400 + rnd.nextInt(600)
    val nRows = 1 + rnd.nextInt(8)
    val nCols = 1 + rnd.nextInt(4)
    val rowH = h / (nRows + 1)
    val boxes = Array.newBuilder[Box]
    for (r <- 0 until nRows; c <- 0 until nCols) {
      if (rnd.nextDouble() < 0.9) {
        val x = c * (w / nCols) + 5 + rnd.nextInt(20)
        val y = r * rowH + 8 + rnd.nextInt(math.max(1, rowH / 3))
        boxes += mkBox(rnd, x, y, vocab(rnd.nextInt(vocab.length)), conf(rnd))
      }
    }
    val lines: Array[Int] =
      if (tool == Tool.TableBands) {
        if (rnd.nextDouble() < 0.1) Array.empty // G6 fallback case
        else (1 to nRows).flatMap { r =>
          val y = r * rowH
          // each detected segment contributes both endpoint ys, jittered
          Seq(y + rnd.nextInt(3), y + rnd.nextInt(3))
        }.toArray
      } else Array.empty
    val rects: Array[Rect] =
      if (tool == Tool.TableRects) {
        if (rnd.nextDouble() < 0.1) Array.empty // G6 fallback case
        else {
          val out = Array.newBuilder[Rect]
          for (r <- 0 until nRows; c <- 0 until nCols) {
            // some undersized rects that the w/20 × h/30 filter drops
            if (rnd.nextDouble() < 0.08)
              out += Rect(c * (w / nCols), r * rowH, 3, 2)
            else
              out += Rect(c * (w / nCols), r * rowH, w / nCols, rowH)
          }
          out.result()
        }
      } else Array.empty
    Payload(boxes.result(), w, h, lines, rects, "")
  }

  private val htmlWords = Array("spark", "catalyst", "shuffle", "partition",
    "extraction", "pipeline", "turn", "transcript", "row", "cluster",
    "column", "cell", "grid", "alignment", "confidence", "stable", "order")

  private def sentence(rnd: Random, n: Int): String =
    (0 until n).map(_ => htmlWords(rnd.nextInt(htmlWords.length))).mkString(" ")

  private def htmlPayload(rnd: Random): String = {
    val sb = new StringBuilder
    sb ++= "<html><head><title>t</title><script>var x=1;</script></head><body>"
    sb ++= "<nav><a href=\"/a\">home</a> <a href=\"/b\">about</a> <a href=\"/c\">contact</a></nav>"
    val nParas = 1 + rnd.nextInt(5)
    for (_ <- 0 until nParas) {
      sb ++= s"<p>${sentence(rnd, 18 + rnd.nextInt(30))}, ${sentence(rnd, 5)}.</p>"
      if (rnd.nextDouble() < 0.3)
        sb ++= s"<div class=\"ad\"><a href=\"/x\">${sentence(rnd, 3)}</a></div>"
    }
    sb ++= s"<footer><a href=\"/p\">privacy</a> <a href=\"/t\">terms</a> copyright</footer>"
    sb ++= "</body></html>"
    sb.toString
  }

  /** J1 dictionary with exact/prefix/substring/tie cases (FIXTURES §2). */
  def drawingsDict(): Seq[Drawing] = {
    def d(proj: String, pn: String, name: String, link: String) =
      Drawing(proj, pn, name, link)
    (0 until 5).flatMap { p =>
      (0 until 11).flatMap { q =>
        Seq(
          d(s"proj$p", s"part$q", "exact", s"https://x/files/DWG-100.pdf"),
          d(s"proj$p", s"part$q", "prefixext", s"https://x/files/DWG-200-B.PDF"),
          d(s"proj$p", s"part$q", "substr", s"https://x/files/XDWG-300X.pdf"),
          d(s"proj$p", s"part$q", "tie1", s"https://x/files/DWG-2AA.pdf"),
          d(s"proj$p", s"part$q", "tie2", s"https://x/files/DWG-2AB.pdf"),
          d(s"proj$p", s"part$q", "encoded", s"https://x/files/AB%2D1.pdf"),
          d(s"proj$p", s"part$q", "nonpdf", s"https://x/files/notes.txt"),
          d(s"proj$p", s"part$q", "nolink", "")
        )
      }
    } ++ Seq(d("projE", "partE", "edge", "https://x/files/DWG-100.pdf"))
  }

  /** The edge-case rows mandated by FIXTURES.md §1 — one conversation
    * per pinned reference behavior, stable payloads (no RNG). */
  def edgeCaseTurns(): Seq[Turn] = {
    def b(x: Int, y: Int, w: Int, h: Int, t: String, c: Double) =
      Box(x, y, x + w, y, x + w, y + h, x, y + h, t, c)
    def turn(cid: String, idx: Int, pl: Payload, tool: String) =
      Turn(cid, idx, "tool", PayloadCodec.encode(pl), tool, new Timestamp(BaseTs))
    val out = Seq.newBuilder[Turn]

    // P1: empty / whitespace-only texts
    out += turn("edge-p1", 0, Payload(Array(
      b(0, 0, 50, 20, "", 0.9), b(0, 30, 50, 20, "   ", 0.9),
      b(0, 60, 50, 20, "keep", 0.9)), 200, 100, Array.empty, Array.empty, ""),
      Tool.TableSimple)

    // P2: diameter conversions incl. leading 'O' (must NOT convert)
    out += turn("edge-p2", 0, Payload(Array(
      b(0, 0, 50, 20, "O12", 0.9),        // leading: no whitespace before
      b(0, 30, 50, 20, "bolt O12", 0.9),  // converts
      b(0, 60, 50, 20, "O 12", 0.9),      // no digit directly after
      b(0, 90, 50, 20, "x\tO9", 0.9)),    // tab counts as whitespace
      200, 140, Array.empty, Array.empty, ""), Tool.Quick)

    // O1: equal y_center, distinct emission order (stable sort)
    out += turn("edge-o1", 0, Payload(Array(
      b(100, 10, 50, 20, "second", 0.9), b(0, 10, 50, 20, "first", 0.8),
      b(50, 10, 50, 20, "third", 0.7)), 300, 60, Array.empty, Array.empty, ""),
      Tool.Quick)

    // A2: odd/even height lists pin the upper median
    out += turn("edge-a2-odd", 0, Payload(Array(
      b(0, 0, 50, 10, "a", 0.9), b(0, 100, 50, 30, "b", 0.9),
      b(0, 200, 50, 50, "c", 0.9)),
      600, 400, Array(0, 150, 300), Array.empty, ""), Tool.TableBands)
    out += turn("edge-a2-even", 0, Payload(Array(
      b(0, 0, 50, 10, "a", 0.9), b(0, 100, 50, 30, "b", 0.9),
      b(0, 200, 50, 50, "c", 0.9), b(0, 300, 50, 70, "d", 0.9)),
      600, 500, Array(0, 150, 300), Array.empty, ""), Tool.TableBands)

    // G1: member drifting > thresh from cluster FIRST element but
    // within thresh of the previous member (cluster-to-first trap)
    out += turn("edge-g1-drift", 0, Payload(Array(
      b(0, 0, 50, 25, "r1", 0.9), b(0, 80, 50, 25, "r2", 0.9)),
      600, 400, Array(100, 118, 136, 300), Array.empty, ""), Tool.TableBands)

    // G6: lines empty → simple fallback; single cluster → <2 bounds
    out += turn("edge-g6-nolines", 0, Payload(Array(
      b(0, 0, 50, 20, "a O1", 0.9)), 600, 400, Array.empty, Array.empty, ""),
      Tool.TableBands)
    out += turn("edge-g6-onebound", 0, Payload(Array(
      b(0, 0, 50, 20, "a O1", 0.9)), 600, 400, Array(100, 105), Array.empty, ""),
      Tool.TableBands)

    // G6: rects empty → simple fallback
    out += turn("edge-g6-norects", 0, Payload(Array(
      b(0, 0, 50, 20, "a", 0.9)), 600, 400, Array.empty, Array.empty, ""),
      Tool.TableRects)

    // G3: rect with zero boxes → {"",0}; box midpoint exactly on
    // x+w edge → excluded (half-open)
    out += turn("edge-g3", 0, Payload(Array(
      b(90, 10, 20, 20, "onEdge", 0.9), // mx = 100 = x+w of rect0
      b(10, 10, 20, 20, "inR0", 0.9)),
      600, 400, Array.empty,
      Array(Rect(0, 0, 100, 50), Rect(100, 0, 100, 50), Rect(0, 50, 100, 50)),
      ""), Tool.TableRects)

    // G2: boxes above first bound and below last bound (head/tail)
    out += turn("edge-g2-headtail", 0, Payload(Array(
      b(0, 5, 50, 10, "head", 0.9), b(0, 120, 50, 10, "mid", 0.8),
      b(0, 390, 50, 10, "tail", 0.7)),
      600, 400, Array(100, 101, 200, 202, 350, 351), Array.empty, ""),
      Tool.TableBands)

    out.result()
  }
}
