package graft.kernel

import graft.model._
import java.util.Comparator

/** Production per-turn extraction kernel — the code that runs inside
  * `mapPartitions` on executors. Implements exactly the semantics the
  * plain-Scala oracle (graft.oracle.Oracle) transliterates from the
  * reference, but written for throughput: streaming JSON decode,
  * primitive arrays, stable TimSort on index-carrying records, no
  * per-box closures in the hot loops. `KernelEqualitySpec` asserts
  * kernel == oracle on the full synthetic corpus.
  *
  * Reference semantics pinned here (citations in the oracle):
  * simple path backend/main.py:64-100; band path :210-296; rect path
  * :105-211; quick join :557; fix_diameter :45-48.
  */
object Extractor {

  /** Mutable per-turn extraction counters, aggregated per partition
    * into Spark accumulators (A6: backend/main.py:72,96 print counters
    * → accumulator-backed metrics per BASELINE.json north_star). */
  final class Counters {
    var turns: Long = 0L
    var boxesIn: Long = 0L
    var boxesDropped: Long = 0L
    var cellsOut: Long = 0L
    var blocksKept: Long = 0L
    var blocksDropped: Long = 0L
  }

  // reusable sorted-fragment record (stable sort carries the index)
  private final class Frag(val y: Int, val x: Int, val idx: Int,
                           val text: String, val conf: Double)

  private val byY: Comparator[Frag] = new Comparator[Frag] {
    def compare(a: Frag, b: Frag): Int = Integer.compare(a.y, b.y)
  }
  private val byYX: Comparator[Frag] = new Comparator[Frag] {
    def compare(a: Frag, b: Frag): Int = {
      val c = Integer.compare(a.y, b.y)
      if (c != 0) c else Integer.compare(a.x, b.x)
    }
  }

  // P2: lookbehind whitespace, lookahead digit (backend/main.py:47)
  private val DiameterPat = java.util.regex.Pattern.compile("(?<=\\s)O(?=\\d)")

  def fixDiameter(s: String): String = {
    // fast path: most texts contain no 'O' at all
    var i = s.indexOf('O')
    var found = false
    while (i >= 0 && !found) {
      if (i > 0 && i + 1 < s.length &&
          Character.isWhitespace(s.charAt(i - 1)) && isAsciiDigit(s.charAt(i + 1)))
        found = true
      else i = s.indexOf('O', i + 1)
    }
    if (!found) s else DiameterPat.matcher(s).replaceAll("Ø")
  }

  @inline private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Dispatch one turn (C7, backend/main.py:551-576). Unknown tools
    * pass the text through untouched (plain conversational turns). */
  def extract(turn: Turn, ctr: Counters): ExtractedTurn = {
    ctr.turns += 1
    // per-turn dropped-box delta rides on the output row so lineage
    // can aggregate it per bucket (the run-global accumulator total
    // is NOT a per-bucket number)
    val dropped0 = ctr.boxesDropped
    val out = turn.tool match {
      case Tool.Quick | Tool.TableSimple =>
        val pl = PayloadCodec.decode(turn.text)
        ctr.boxesIn += pl.boxes.length
        val cells = simpleCells(pl.boxes, ctr)
        finish(turn, pl.col, cells, pl.boxes.length, ctr)
      case Tool.TableBands =>
        val pl = PayloadCodec.decode(turn.text)
        ctr.boxesIn += pl.boxes.length
        finish(turn, pl.col, bandCells(pl, ctr), pl.boxes.length, ctr)
      case Tool.TableRects =>
        val pl = PayloadCodec.decode(turn.text)
        ctr.boxesIn += pl.boxes.length
        finish(turn, pl.col, rectCells(pl, ctr), pl.boxes.length, ctr)
      case Tool.HtmlMain =>
        val (text, kept, dropped) = HtmlMain.extractWithStats(turn.text)
        ctr.blocksKept += kept
        ctr.blocksDropped += dropped
        ExtractedTurn(turn.conv_id, turn.turn_idx, turn.role, turn.tool, "",
          text, Array.empty, 0, 0)
      case _ =>
        ExtractedTurn(turn.conv_id, turn.turn_idx, turn.role, turn.tool, "",
          turn.text, Array.empty, 0, 0)
    }
    val d = ctr.boxesDropped - dropped0
    if (d == 0L) out else out.copy(n_dropped = d.toInt)
  }

  private def finish(turn: Turn, col: String, cells: Array[Cell],
                     nBoxes: Int, ctr: Counters): ExtractedTurn = {
    ctr.cellsOut += cells.length
    val text =
      if (turn.tool == Tool.Quick) {
        // "\n".join(texts) (backend/main.py:557)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < cells.length) {
          if (i > 0) sb.append('\n')
          sb.append(cells(i).text)
          i += 1
        }
        sb.toString
      } else ""
    ExtractedTurn(turn.conv_id, turn.turn_idx, turn.role, turn.tool, col,
      text, cells, nBoxes, cells.length)
  }

  /** Simple path: strip → drop empty → fix_diameter → stable sort by
    * y_center (original order breaks ties). Sorting uses primitive
    * long keys `(y + 2³¹) << 20 | seq` — stability by construction,
    * no per-box objects, dual-pivot primitive sort (the comparator
    * object path remains for the pathological > 2²⁰-box turn). */
  def simpleCells(boxes: Array[Box], ctr: Counters): Array[Cell] = {
    if (boxes.length >= (1 << 20)) return simpleCellsBig(boxes, ctr)
    val texts = new Array[String](boxes.length)
    val confs = new Array[Double](boxes.length)
    val keys = new Array[Long](boxes.length)
    var n = 0
    var i = 0
    while (i < boxes.length) {
      val b = boxes(i)
      val raw = b.t.trim
      if (raw.isEmpty) ctr.boxesDropped += 1
      else {
        texts(n) = fixDiameter(raw)
        confs(n) = b.c
        keys(n) = ((b.yCenter.toLong + 0x80000000L) << 20) | n
        n += 1
      }
      i += 1
    }
    val ks = java.util.Arrays.copyOf(keys, n)
    java.util.Arrays.sort(ks)
    val out = new Array[Cell](n)
    i = 0
    while (i < n) {
      val idx = (ks(i) & 0xFFFFF).toInt
      out(i) = Cell(texts(idx), confs(idx))
      i += 1
    }
    out
  }

  private def simpleCellsBig(boxes: Array[Box], ctr: Counters): Array[Cell] = {
    val frags = new Array[Frag](boxes.length)
    var n = 0
    var i = 0
    while (i < boxes.length) {
      val b = boxes(i)
      val raw = b.t.trim
      if (raw.isEmpty) ctr.boxesDropped += 1
      else {
        frags(n) = new Frag(b.yCenter, 0, n, fixDiameter(raw), b.c)
        n += 1
      }
      i += 1
    }
    val slice = java.util.Arrays.copyOf(frags, n)
    java.util.Arrays.sort(slice, byY) // TimSort: stable
    val out = new Array[Cell](n)
    i = 0
    while (i < n) { out(i) = Cell(slice(i).text, slice(i).conf); i += 1 }
    out
  }

  /** Band path (advanced_cells): NO fix_diameter here — the reference
    * band path only strips (backend/main.py:264). */
  def bandCells(pl: Payload, ctr: Counters): Array[Cell] = {
    // A2 merge threshold: upper median of kept-box heights, floor 20
    var nH = 0
    val heights = new Array[Double](pl.boxes.length)
    var i = 0
    while (i < pl.boxes.length) {
      val b = pl.boxes(i)
      if (b.t.trim.nonEmpty) { heights(nH) = b.height; nH += 1 }
      i += 1
    }
    val mergeThresh =
      if (nH > 0) {
        val hs = java.util.Arrays.copyOf(heights, nH)
        java.util.Arrays.sort(hs)
        math.max(hs(nH / 2), 20.0)
      } else 20.0

    // G1 cluster-to-first over sorted ys
    val ys = pl.lines.clone()
    java.util.Arrays.sort(ys)
    val bounds = new Array[Int](ys.length)
    var nB = 0
    var clusterFirst = 0
    var clusterSum = 0L
    var clusterLen = 0
    i = 0
    while (i < ys.length) {
      val y = ys(i)
      if (clusterLen == 0 || math.abs(y - clusterFirst) > mergeThresh) {
        if (clusterLen > 0) {
          bounds(nB) = (clusterSum.toDouble / clusterLen).toInt; nB += 1
        }
        clusterFirst = y; clusterSum = y; clusterLen = 1
      } else { clusterSum += y; clusterLen += 1 }
      i += 1
    }
    if (clusterLen > 0) { bounds(nB) = (clusterSum.toDouble / clusterLen).toInt; nB += 1 }

    // G6: fall back to the simple path (WITH fix_diameter) when no
    // lines or < 2 bounds (backend/main.py:255-257)
    if (pl.lines.isEmpty || nB < 2) return simpleCells(pl.boxes, ctr)

    // bucket kept boxes into head/middle/tail bands
    val frags = new Array[Frag](pl.boxes.length)
    var n = 0
    i = 0
    while (i < pl.boxes.length) {
      val b = pl.boxes(i)
      val t = b.t.trim
      if (t.isEmpty) ctr.boxesDropped += 1
      else { frags(n) = new Frag(b.yCenter, b.xCenter, n, t, b.c); n += 1 }
      i += 1
    }
    val out = Array.newBuilder[Cell]
    // head: y < bounds(0); middles: [b_i, b_{i+1}); tail: y >= last
    emitBand(frags, n, Int.MinValue, bounds(0), out, strictLow = false)
    var bi = 0
    while (bi < nB - 1) {
      emitBand(frags, n, bounds(bi), bounds(bi + 1), out, strictLow = true)
      bi += 1
    }
    emitTail(frags, n, bounds(nB - 1), out)
    out.result()
  }

  /** collect frags with lo <= y < hi (head uses y < hi only), sort
    * (y, x) stable, join " ", min conf; skip empty bands. */
  private def emitBand(frags: Array[Frag], n: Int, lo: Int, hi: Int,
                       out: scala.collection.mutable.Builder[Cell, Array[Cell]],
                       strictLow: Boolean): Unit = {
    var cnt = 0
    var i = 0
    while (i < n) {
      val f = frags(i)
      if ((if (strictLow) f.y >= lo else true) && f.y < hi) cnt += 1
      i += 1
    }
    if (cnt == 0) return
    val band = new Array[Frag](cnt)
    var j = 0
    i = 0
    while (i < n) {
      val f = frags(i)
      if ((if (strictLow) f.y >= lo else true) && f.y < hi) { band(j) = f; j += 1 }
      i += 1
    }
    out += joinBand(band)
  }

  private def emitTail(frags: Array[Frag], n: Int, lo: Int,
                       out: scala.collection.mutable.Builder[Cell, Array[Cell]]): Unit = {
    var cnt = 0
    var i = 0
    while (i < n) { if (frags(i).y >= lo) cnt += 1; i += 1 }
    if (cnt == 0) return
    val band = new Array[Frag](cnt)
    var j = 0
    i = 0
    while (i < n) { if (frags(i).y >= lo) { band(j) = frags(i); j += 1 }; i += 1 }
    out += joinBand(band)
  }

  private def joinBand(band: Array[Frag]): Cell = {
    java.util.Arrays.sort(band, byYX)
    val sb = new java.lang.StringBuilder(32)
    var minConf = Double.MaxValue
    var i = 0
    while (i < band.length) {
      if (i > 0) sb.append(' ')
      sb.append(band(i).text)
      if (band(i).conf < minConf) minConf = band(i).conf
      i += 1
    }
    Cell(sb.toString, minConf)
  }

  /** Rect path (advanced_cells_with_rectangles). */
  def rectCells(pl: Payload, ctr: Counters): Array[Cell] = {
    // G3 size filter with floor division (backend/main.py:148-150)
    val minW = pl.w / 20
    val minH = pl.h / 30
    var nR = 0
    val keep = new Array[Rect](pl.rects.length)
    var i = 0
    while (i < pl.rects.length) {
      val r = pl.rects(i)
      if (r.w >= minW && r.h >= minH) { keep(nR) = r; nR += 1 }
      i += 1
    }
    if (nR == 0) return simpleCells(pl.boxes, ctr) // G6 fallback

    val rects = java.util.Arrays.copyOf(keep, nR)
    java.util.Arrays.sort(rects, new Comparator[Rect] {
      def compare(a: Rect, b: Rect): Int = {
        val c = Integer.compare(a.y, b.y)
        if (c != 0) c else Integer.compare(a.x, b.x)
      }
    })

    // assign each kept box to its first containing rect
    val buckets = new Array[scala.collection.mutable.ArrayBuffer[Frag]](nR)
    i = 0
    while (i < pl.boxes.length) {
      val b = pl.boxes(i)
      val raw = b.t.trim
      if (raw.isEmpty) ctr.boxesDropped += 1
      else {
        val cleaned = fixDiameter(raw)
        val mx = b.xCenter
        val my = b.yCenter
        var ri = 0
        var hit = -1
        while (hit < 0 && ri < nR) {
          val r = rects(ri)
          if (r.x <= mx && mx < r.x + r.w && r.y <= my && my < r.y + r.h) hit = ri
          ri += 1
        }
        if (hit >= 0) {
          if (buckets(hit) == null)
            buckets(hit) = scala.collection.mutable.ArrayBuffer.empty[Frag]
          buckets(hit) += new Frag(my, mx, i, cleaned, b.c)
        } else ctr.boxesDropped += 1 // box in no rect is dropped (main.py:199)
      }
      i += 1
    }

    val out = new Array[Cell](nR)
    i = 0
    while (i < nR) {
      val bucket = buckets(i)
      out(i) =
        if (bucket == null) Cell("", 0.0) // main.py:197-199
        else joinBand(bucket.toArray)
      i += 1
    }
    out
  }
}
