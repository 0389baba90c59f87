package graft

import graft.model._
import graft.oracle.{Oracle, BomRowStaged}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle's reference semantics with hand-computed expected
  * values — each test cites the reference behavior it pins. */
class OracleSpec extends AnyFunSuite {

  private def b(x: Int, y: Int, w: Int, h: Int, t: String, c: Double) =
    Box(x, y, x + w, y, x + w, y + h, x, y + h, t, c)

  // ── P2 fix_diameter (backend/main.py:45-48) ──────────────────────
  test("fix_diameter converts only whitespace-preceded O before digit") {
    assert(Oracle.fixDiameter("bolt O12") == "bolt Ø12")
    assert(Oracle.fixDiameter("O12") == "O12")       // no preceding ws
    assert(Oracle.fixDiameter("O 12") == "O 12")      // no digit after
    assert(Oracle.fixDiameter("x\tO9") == "x\tØ9")    // tab is \s
    assert(Oracle.fixDiameter("a O1 O2") == "a Ø1 Ø2")
    assert(Oracle.fixDiameter("XO1") == "XO1")        // preceded by letter
  }

  // ── P1 + O1 simple path ──────────────────────────────────────────
  test("simpleCells filters empty, strips, sorts stably by y_center") {
    val boxes = Seq(
      b(100, 10, 50, 20, " second ", 0.9), // y_center 20
      b(0, 10, 50, 20, "", 0.5),           // dropped
      b(0, 10, 50, 20, "  ", 0.5),         // dropped
      b(0, 10, 50, 20, "first", 0.8),      // y_center 20, after 'second'
      b(0, 0, 50, 10, "top", 0.7))         // y_center 5
    val cells = Oracle.simpleCells(boxes)
    assert(cells.map(_.text) == Seq("top", " second ".trim, "first"))
    assert(cells.map(_.confidence) == Seq(0.7, 0.9, 0.8))
  }

  test("quick text is newline-joined (backend/main.py:557)") {
    val boxes = Seq(b(0, 0, 50, 10, "a", 1.0), b(0, 30, 50, 10, "b", 1.0))
    assert(Oracle.quickText(boxes) == "a\nb")
  }

  test("y_center truncates toward zero like Python int()") {
    // y0=1, y2=4 → (1+4)/2 = 2.5 → int() = 2
    val box = Box(0, 1, 10, 1, 10, 4, 0, 4, "t", 1.0)
    assert(box.yCenter == 2)
  }

  // ── A2 upper median (backend/main.py:215-218) ────────────────────
  test("band merge threshold uses upper median sorted[len//2]") {
    // heights [10,30,50]: len//2=1 → 30; thresh = max(30,20) = 30
    // heights [10,30,50,70]: len//2=2 → 50 (upper median, not average)
    // verified indirectly: with lines clustered at gap 31 vs 51
    val boxesOdd = Seq(b(0, 0, 50, 10, "a", 0.9), b(0, 100, 50, 30, "b", 0.9),
      b(0, 200, 50, 50, "c", 0.9))
    // lines 0 and 31 apart: |31-0|=31 > 30 → two clusters → 2 bounds
    val plOdd = Payload(boxesOdd.toArray, 600, 400, Array(0, 31), Array.empty, "")
    val cells = Oracle.bandCells(plOdd)
    // bounds [0,31]: head empty (no y<0); band [0,31): 'a' y=5; tail y>=31: b,c
    assert(cells.map(_.text) == Seq("a", "b c"))

    // same lines but 30 apart: |30-0|=30 ≤ 30 → one cluster → fallback
    val plOne = Payload(boxesOdd.toArray, 600, 400, Array(0, 30), Array.empty, "")
    assert(Oracle.bandCells(plOne).map(_.text) == Seq("a", "b", "c"))
  }

  // ── G1 cluster-to-first (backend/main.py:247-252) ────────────────
  test("clustering splits on distance to cluster FIRST element") {
    // thresh 25 (heights 25,25 → median 25). ys 100,118,136:
    // 118 joins (|118-100|=18), 136 splits (|136-100|=36 even though
    // |136-118|=18) — the cluster-to-last miswrite would merge it.
    val boxes = Seq(b(0, 0, 50, 25, "r1", 0.9), b(0, 80, 50, 25, "r2", 0.9))
    val pl = Payload(boxes.toArray, 600, 400, Array(100, 118, 136, 300), Array.empty, "")
    val cells = Oracle.bandCells(pl)
    // clusters [100,118],[136],[300] → bounds [109,136,300]
    // r1 y=12 head (<109); r2 y=92 ... wait y_center of (80,105)=92 <109 → head too
    assert(cells.map(_.text) == Seq("r1 r2"))
  }

  // ── G2 head/middle/tail bands ────────────────────────────────────
  test("band bucketing emits head, non-empty middles, tail in order") {
    val boxes = Seq(
      b(0, 0, 50, 10, "head", 0.9),   // y=5
      b(0, 115, 50, 10, "mid", 0.8),  // y=120
      b(0, 385, 50, 10, "tail", 0.7)) // y=390
    // heights all 10 → median 10 → thresh 20
    // lines: clusters [100,101],[200,202],[350,351] → bounds [100,201,350]
    val pl = Payload(boxes.toArray, 600, 400,
      Array(100, 101, 200, 202, 350, 351), Array.empty, "")
    val cells = Oracle.bandCells(pl)
    assert(cells.map(_.text) == Seq("head", "mid", "tail"))
    assert(cells.map(_.confidence) == Seq(0.9, 0.8, 0.7))
  }

  test("band path does NOT apply fix_diameter (backend/main.py:264)") {
    val boxes = Seq(b(0, 5, 50, 10, "a O12", 0.9), b(0, 115, 50, 10, "x", 0.8))
    val pl = Payload(boxes.toArray, 600, 400, Array(100, 101, 200, 202), Array.empty, "")
    val cells = Oracle.bandCells(pl)
    assert(cells.map(_.text) == Seq("a O12", "x")) // NOT "a Ø12"
    // …but the simple-path fallback DOES apply it
    val plNoLines = Payload(boxes.toArray, 600, 400, Array.empty, Array.empty, "")
    assert(Oracle.bandCells(plNoLines).map(_.text) == Seq("a Ø12", "x"))
  }

  // ── G3 rect containment ──────────────────────────────────────────
  test("rect path: half-open containment, first rect wins, empty cell") {
    val rects = Array(Rect(0, 0, 100, 50), Rect(100, 0, 100, 50), Rect(0, 50, 100, 50))
    val boxes = Seq(
      b(90, 10, 20, 20, "onEdge", 0.9), // mx=100: NOT in rect0 ([0,100)), in rect1
      b(10, 10, 20, 20, "inR0", 0.8),
      b(10, 300, 20, 20, "nowhere", 0.7)) // in no rect → dropped
    val pl = Payload(boxes.toArray, 600, 400, Array.empty, rects, "")
    val cells = Oracle.rectCells(pl)
    assert(cells == Seq(Cell("inR0", 0.8), Cell("onEdge", 0.9), Cell("", 0.0)))
  }

  test("rect size filter uses floor division w//20, h//30") {
    // w=610 → w//20=30; rect w=30 passes, w=29 dropped
    val rects = Array(Rect(0, 0, 30, 50), Rect(100, 0, 29, 50))
    val boxes = Seq(b(5, 10, 10, 10, "a", 0.9), b(105, 10, 10, 10, "b", 0.9))
    val pl = Payload(boxes.toArray, 610, 400, Array.empty, rects, "")
    val cells = Oracle.rectCells(pl)
    assert(cells == Seq(Cell("a", 0.9))) // 'b' in dropped rect → dropped
  }

  test("rect path falls back to simple when all rects filtered") {
    val rects = Array(Rect(0, 0, 3, 2))
    val boxes = Seq(b(0, 0, 50, 20, "a O1", 0.9))
    val pl = Payload(boxes.toArray, 600, 400, Array.empty, rects, "")
    assert(Oracle.rectCells(pl).map(_.text) == Seq("a Ø1"))
  }

  test("rect cell joins fragments in (y,x) order with min confidence") {
    val rects = Array(Rect(0, 0, 200, 200))
    val boxes = Seq(
      b(100, 50, 20, 10, "B", 0.7),  // (my=55, mx=110)
      b(0, 50, 20, 10, "A", 0.9),    // (my=55, mx=10) → first
      b(0, 0, 20, 10, "top", 0.95))  // (my=5)
    val pl = Payload(boxes.toArray, 600, 400, Array.empty, rects, "")
    assert(Oracle.rectCells(pl) == Seq(Cell("top A B", 0.7)))
  }

  // ── J1 scoring (frontend/index.html:1199-1249, 1815) ─────────────
  test("match scoring: exact 1.0, prefix 0.99, substring 0.85, else 0") {
    assert(Oracle.scoreMatch("DWG-100", "DWG-100") == 1.0)
    assert(Oracle.scoreMatch("dwg-100", "DWG-100") == 1.0)      // upper()
    assert(Oracle.scoreMatch(" DWG-100 ", "DWG-100") == 1.0)    // trim()
    assert(Oracle.scoreMatch("DWG-1", "DWG-100") == 0.99)
    assert(Oracle.scoreMatch("WG-10", "DWG-100") == 0.85)
    assert(Oracle.scoreMatch("XYZ", "DWG-100") == 0.0)
    assert(Oracle.scoreMatch("", "DWG-100") == 0.0)
  }

  test("substring matches (exactly 0.85) are REJECTED by strict > 0.85") {
    val dict = Seq("XDWG-300X")
    val (m, t, review, sim) = Oracle.classify("DWG-300", dict)
    assert(t == "BO" && m == "DWG-300" && review && sim == 0.85)
  }

  test("prefix matches auto-accept as Child Part") {
    val (m, t, review, sim) = Oracle.classify("DWG-2", Seq("DWG-200-B", "ZZZ"))
    assert(t == "Child Part" && m == "DWG-200-B" && !review && sim == 0.99)
  }

  test("score ties resolve alphabetically ascending") {
    val (target, rating) = Oracle.bestMatch("DWG-2", Seq("DWG-2AB", "DWG-2AA"))
    assert(target == "DWG-2AA" && rating == 0.99)
  }

  test("empty part text or empty dict → no classification, NaN score") {
    assert(Oracle.classify("", Seq("A"))._4.isNaN)
    assert(Oracle.classify("  ", Seq("A"))._4.isNaN)
    assert(Oracle.classify("X", Seq.empty)._4.isNaN)
  }

  test("C1 manual-match guard: non-empty manual match suppresses re-classification") {
    // auto would match DWG-200-B as Child Part; manual wins, no review,
    // but the similarity score is STILL stored (index.html:1838-1839)
    val (m, t, review, sim) =
      Oracle.classify("DWG-2", Seq("DWG-200-B"), Some(("HAND-SET", "BO")))
    assert(m == "HAND-SET" && t == "BO" && !review && sim == 0.99)
    // auto would be a no-match BO with review; manual still suppresses
    val (m2, t2, review2, sim2) =
      Oracle.classify("ZZZ", Seq("DWG-200-B"), Some(("HAND-SET", "Child Part")))
    assert(m2 == "HAND-SET" && t2 == "Child Part" && !review2 && sim2 == 0.0)
    // matching never ran (empty part text) → NaN score, manual kept
    assert(Oracle.classify("", Seq("A"), Some(("H", "BO")))._4.isNaN)
    // empty manual value does NOT guard
    val (m3, _, review3, _) =
      Oracle.classify("ZZZ", Seq("DWG-200-B"), Some(("", "BO")))
    assert(m3 == "ZZZ" && review3)
  }

  // ── C3 warning string (frontend/index.html:1271-1313) ────────────
  test("warning string: segment order, letter order, conf boundaries") {
    val w = Oracle.rowWarning(
      qty = OcrField("2", 0.97, ocr = true),      // OCR, no warn (>=0.95)
      desc = OcrField("plate", 0.0, ocr = true),  // OCRedited (conf==0)
      mat = OcrField("SS304", 0.5, ocr = false),  // Manual, warn (0<0.5<0.95)
      needsReview = true, similarity = 0.85)
    assert(w == "OCR(Q); OCRedited(D); Manual(M); Warning(M,T,P)")
  }

  test("warning: conf exactly 0.95 does not warn; empty text ignored") {
    val w = Oracle.rowWarning(
      qty = OcrField("2", 0.95, ocr = true),
      desc = OcrField("", 0.5, ocr = true), // empty text: no class, no warn
      mat = OcrField.empty,
      needsReview = false, similarity = 0.99)
    assert(w == "OCR(Q)")
  }

  test("warning: NaN similarity (no match attempted) adds no P") {
    val w = Oracle.rowWarning(OcrField.empty, OcrField.empty, OcrField.empty,
      needsReview = false, similarity = Double.NaN)
    assert(w == "")
  }

  // ── C4 validation (frontend/index.html:2239-2277) ────────────────
  private def staged(tpe: String, qty: String, matched: String) =
    BomRowStaged("c", 0, OcrField.empty, OcrField(qty, 1.0, ocr = true),
      OcrField.empty, OcrField.empty, matched, tpe, needsReview = false,
      similarity = Double.NaN)

  test("validation: fully-empty rows skipped; missing and invalid sets") {
    val rows = Seq(
      staged("", "", ""),                    // skipped
      staged("Child Part", "12", "DWG-100"), // valid
      staged("BO", "1 2", "X"))              // invalid qty
    val (ok, msgs) = Oracle.validate(rows)
    assert(!ok && msgs == Seq("Invalid Data (Quantity)"))
    val (ok2, msgs2) = Oracle.validate(Seq(staged("", "5", "")))
    assert(!ok2 && msgs2 == Seq("(Type, Part Number)"))
    val (ok3, _) = Oracle.validate(Seq(staged("BO", "007", "X")))
    assert(ok3) // leading zeros still match ^\d+$
    assert(!Oracle.validate(Seq(staged("", "", "")))._1) // no valid row
  }

  // ── W1 numbering with gaps (frontend/index.html:2331-2368) ───────
  test("item numbers use visual row index including skipped rows") {
    val rows = Seq(
      staged("Child Part", "1", "A"), // vRow 0 → item last+1
      staged("", "", ""),             // skipped but consumes vRow 1
      staged("BO", "2", "B"))         // vRow 2 → item last+3
    val (out, maxItem) = Oracle.numberAndRoute(rows, lastItem = 10)
    assert(out.map(_.item_number) == Seq(11L, 13L))
    assert(out.map(_.row_type) == Seq("Child Part", "BO"))
    assert(maxItem == 13L)
  }

  test("rows with qty xor type are skipped at sink (C5)") {
    val rows = Seq(staged("Child Part", "", "A"), staged("", "2", "B"))
    val (out, maxItem) = Oracle.numberAndRoute(rows, 0)
    assert(out.isEmpty && maxItem == 0)
  }

  // ── J2 positional zip ────────────────────────────────────────────
  test("assembly pads short columns with non-OCR empty fields") {
    val cols = Map(
      "PartNumber" -> Seq(Cell("DWG-100", 0.9), Cell("ZZZ", 0.8)),
      "Quantity" -> Seq(Cell("5", 0.99)))
    val rows = Oracle.assemble(cols, Seq("DWG-100"))
    assert(rows.length == 2)
    assert(rows(0).matched == "DWG-100" && rows(0).rowType == "Child Part")
    assert(rows(1).matched == "ZZZ" && rows(1).rowType == "BO" && rows(1).needsReview)
    assert(rows(1).qty == OcrField("", 0.0, ocr = false)) // padded
  }
}
