package graft.oracle

import graft.model._

/** Golden oracle: a deliberately naive, single-threaded, plain-Scala
  * transliteration of the reference's extraction semantics (SURVEY §5.1).
  * Written FIRST, straight from the cited reference lines; the Spark
  * kernel must match this per turn, exactly. Performance does not
  * matter here — faithfulness does.
  *
  * Pinned semantics (each with its reference evidence):
  *  - P1 empty filter: `strip` then drop empty (backend/main.py:81-84)
  *  - P2 fix_diameter: `(?<=\s)O(?=\d)` → `Ø` (backend/main.py:45-48);
  *    applied in the simple and rect paths but NOT the band path
  *    (backend/main.py:85 and :184 vs :264 which only strips)
  *  - P4 midpoints: `int((a+b)/2)` — truncation toward zero
  *    (backend/main.py:89, 185-186)
  *  - O1 stable sort by y_center only (backend/main.py:97-98)
  *  - A2 upper median `sorted(h)[len//2]`, thresh `max(median, 20)`
  *    (backend/main.py:215-221)
  *  - G1 cluster-to-FIRST-element: new cluster when
  *    `abs(y - clusters[-1][0]) > merge_thresh`; boundary
  *    `int(sum/len)` (backend/main.py:247-252)
  *  - G2 head/middle/tail bands, `top <= y < bot`, empties skipped
  *    (backend/main.py:268-296)
  *  - G3 rect filter `rw < w//20 or rh < h//30`, first-containing-rect
  *    wins with half-open test, empty rect → ("", 0)
  *    (backend/main.py:146-151, 187-199)
  *  - G6 fallbacks to the simple path (backend/main.py:166-169, 255-257)
  *  - J1 scoring exact 1.0 / prefix 0.99 / substring 0.85 / else 0 on
  *    upper(trim()), strict `> 0.85` accept, alphabetical tie-break
  *    (frontend/index.html:1199-1215, 1230-1249, 1815)
  *  - C3 warning string, Q/D/M letters, segments joined "; "
  *    (frontend/index.html:1271-1313)
  *  - W1 item numbers `last + visualRow + 1` over ALL visual rows
  *    incl. later-skipped ones (frontend/index.html:2331-2361)
  */
object Oracle {

  // ── P2 ──────────────────────────────────────────────────────────────
  private val DiameterRe = "(?<=\\s)O(?=\\d)".r

  /** backend/main.py:45-48 */
  def fixDiameter(text: String): String = DiameterRe.replaceAllIn(text, "Ø")

  // ── simple path (backend/main.py:64-100) ────────────────────────────
  def simpleCells(boxes: Seq[Box]): Seq[Cell] = {
    val kept = boxes.flatMap { b =>
      val raw = b.t.trim
      if (raw.isEmpty) None
      else Some((b.yCenter, fixDiameter(raw), b.c))
    }
    // Python list.sort is stable: equal y keeps emission order.
    kept.sortBy(_._1)(Ordering.Int).map { case (_, t, c) => Cell(t, c) }
  }

  /** quick mode: "\n".join of the simple-path texts (backend/main.py:557) */
  def quickText(boxes: Seq[Box]): String =
    simpleCells(boxes).map(_.text).mkString("\n")

  // ── band path (backend/main.py:210-296 advanced_cells) ──────────────
  def bandCells(pl: Payload): Seq[Cell] = {
    val boxes = pl.boxes.toSeq
    // A2: heights over boxes with non-empty stripped text (main.py:215)
    val heights = boxes.filter(_.t.trim.nonEmpty).map(_.height)
    val mergeThresh: Double =
      if (heights.nonEmpty) {
        val sorted = heights.sorted
        val median = sorted(sorted.length / 2) // upper median, len//2
        math.max(median, 20.0)
      } else 20.0

    // G1: cluster the sorted line ys (main.py:241-252)
    val ys = pl.lines.sorted
    val clusters = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Int]]
    for (y <- ys) {
      if (clusters.isEmpty || math.abs(y - clusters.last.head) > mergeThresh)
        clusters += scala.collection.mutable.ArrayBuffer(y)
      else clusters.last += y
    }
    // Python ints don't overflow: sum as Long before the true division
    val rowBounds = clusters.map(c => (c.foldLeft(0L)(_ + _).toDouble / c.length).toInt).toSeq

    // G6 fallback: `lines is None or len(row_bounds) < 2` (main.py:255-257)
    if (pl.lines.isEmpty || rowBounds.length < 2) return simpleCells(boxes)

    // bucket boxes into bands; band path does NOT fix_diameter (main.py:264)
    final case class C(x: Int, y: Int, text: String, conf: Double)
    val cells = boxes.flatMap { b =>
      val t = b.t.trim
      if (t.isEmpty) None else Some(C(b.xCenter, b.yCenter, t, b.c))
    }

    def emit(band: Seq[C]): Cell = {
      val sorted = band.sortBy(c => (c.y, c.x))(Ordering.Tuple2(Ordering.Int, Ordering.Int))
      Cell(sorted.map(_.text).mkString(" "), sorted.map(_.conf).min)
    }

    val rows = scala.collection.mutable.ArrayBuffer.empty[Cell]
    val head = cells.filter(_.y < rowBounds.head)
    if (head.nonEmpty) rows += emit(head)
    for (Seq(top, bot) <- rowBounds.sliding(2)) {
      val band = cells.filter(c => top <= c.y && c.y < bot)
      if (band.nonEmpty) rows += emit(band)
    }
    val tail = cells.filter(_.y >= rowBounds.last)
    if (tail.nonEmpty) rows += emit(tail)
    rows.toSeq
  }

  // ── rect path (backend/main.py:105-211) ─────────────────────────────
  def rectCells(pl: Payload): Seq[Cell] = {
    // G3 size filter: `rw < w//20 or rh < h//30` (floor div, main.py:148-150)
    val rects0 = pl.rects.filter(r => r.w >= pl.w / 20 && r.h >= pl.h / 30)
    if (rects0.isEmpty) return simpleCells(pl.boxes.toSeq) // G6 (main.py:166-169)

    val rects = rects0.sortBy(r => (r.y, r.x)) // main.py:172

    // one pass: strip → drop empty → fix_diameter → midpoint → first rect
    final case class Frag(idx: Int, mx: Int, my: Int, t: String, c: Double)
    val frags = pl.boxes.toSeq.flatMap { b =>
      val raw = b.t.trim
      if (raw.isEmpty) None
      else {
        val cleaned = fixDiameter(raw)
        val mx = b.xCenter
        val my = b.yCenter
        val hit = rects.indexWhere(r =>
          r.x <= mx && mx < r.x + r.w && r.y <= my && my < r.y + r.h)
        if (hit >= 0) Some(Frag(hit, mx, my, cleaned, b.c)) else None
      }
    }

    rects.indices.map { i =>
      val bucket = frags.filter(_.idx == i)
      if (bucket.isEmpty) Cell("", 0.0)
      else {
        val sorted = bucket.sortBy(f => (f.my, f.mx))(Ordering.Tuple2(Ordering.Int, Ordering.Int))
        Cell(sorted.map(_.t).mkString(" "), sorted.map(_.c).min)
      }
    }
  }

  // ── J1 best fuzzy match (frontend/index.html:1199-1249) ─────────────
  /** exact 1.0 / prefix 0.99 / substring 0.85 / else 0, on trim+upper. */
  def scoreMatch(part: String, child: String): Double = {
    if (part == null || part.isEmpty || child == null || child.isEmpty) return 0.0
    val p = part.trim.toUpperCase
    val c = child.trim.toUpperCase
    if (p == c) 1.0
    else if (c.startsWith(p)) 0.99
    else if (c.contains(p)) 0.85
    else 0.0
  }

  /** Top-1: rating desc, then target asc (lexicographic). Returns
    * (target, rating); ("", 0) when part empty or dict empty. */
  def bestMatch(partText: String, dict: Seq[String]): (String, Double) = {
    if (partText == null || partText.isEmpty || dict.isEmpty) return ("", 0.0)
    var bestT = ""
    var bestR = Double.MinValue
    var first = true
    for (d <- dict) {
      val r = scoreMatch(partText, d)
      if (first || r > bestR || (r == bestR && d.compareTo(bestT) < 0)) {
        bestT = d; bestR = r; first = false
      }
    }
    (bestT, bestR)
  }

  // ── C1 classification (frontend/index.html:1806-1842) ───────────────
  /** Returns (matched, rowType, needsReview, similarity). `similarity`
    * is NaN when no matching was attempted (empty part text or empty
    * dict — JS leaves `_similarityScore` undefined, so the `< 0.95`
    * P-warning check is false). */
  def classify(partText: String, dict: Seq[String]): (String, String, Boolean, Double) =
    classify(partText, dict, None)

  /** C1 with the manual-match guard (frontend/index.html:1819-1836):
    * a pre-existing non-empty "Matched Childpart" suppresses
    * auto-population of matched/type and never sets `_needsReview`,
    * but `_similarityScore` is STILL stored whenever matching ran
    * (non-empty part text and non-empty dict). */
  def classify(partText: String, dict: Seq[String],
               manual: Option[(String, String)]): (String, String, Boolean, Double) = {
    val attempted =
      partText != null && partText.trim.nonEmpty && dict.nonEmpty
    manual match {
      case Some((m, tpe)) if m.nonEmpty =>
        val sim = if (attempted) bestMatch(partText, dict)._2 else Double.NaN
        (m, tpe, false, sim)
      case _ =>
        if (!attempted) ("", "", false, Double.NaN)
        else {
          val (target, rating) = bestMatch(partText, dict)
          if (rating > 0.85) (target, "Child Part", false, rating)
          else (partText, "BO", true, rating)
        }
    }
  }

  // ── C3 warning string (frontend/index.html:1271-1313) ───────────────
  def rowWarning(
      qty: OcrField, desc: OcrField, mat: OcrField,
      needsReview: Boolean, similarity: Double): String = {
    val cols = Seq(("Q", qty), ("D", desc), ("M", mat))
    val ocr = Seq.newBuilder[String]
    val edited = Seq.newBuilder[String]
    val manual = Seq.newBuilder[String]
    val warn = Seq.newBuilder[String]
    for ((letter, f) <- cols) {
      val text = if (f == null) "" else f.text.trim
      val conf = if (f == null) 0.0 else f.confidence
      val isOcr = f != null && f.ocr
      if (text.nonEmpty) {
        if (isOcr && conf > 0) ocr += letter
        else if (isOcr && conf == 0) edited += letter
        else manual += letter
        if (conf > 0 && conf < 0.95) warn += letter
      }
    }
    if (needsReview) warn += "T"
    // JS: `undefined < 0.95` is false → NaN means "no check"
    if (!similarity.isNaN && similarity < 0.95) warn += "P"
    val parts = Seq.newBuilder[String]
    val o = ocr.result(); val e = edited.result(); val m = manual.result(); val w = warn.result()
    if (o.nonEmpty) parts += s"OCR(${o.mkString(",")})"
    if (e.nonEmpty) parts += s"OCRedited(${e.mkString(",")})"
    if (m.nonEmpty) parts += s"Manual(${m.mkString(",")})"
    if (w.nonEmpty) parts += s"Warning(${w.mkString(",")})"
    parts.result().mkString("; ")
  }

  // ── C4 validation (frontend/index.html:2239-2277) ───────────────────
  /** Returns (isValid, messages). Messages replicate the reference's
    * two-segment shape: "(missing…)" then "Invalid Data (…)", with
    * column names in first-seen order. */
  def validate(rows: Seq[BomRowStaged]): (Boolean, Seq[String]) = {
    val missing = scala.collection.mutable.LinkedHashSet.empty[String]
    val invalid = scala.collection.mutable.LinkedHashSet.empty[String]
    var hasValidRow = false
    for (r <- rows) {
      val tpe = r.rowType.trim
      val qty = r.qty.text.trim
      val pn = r.matched.trim
      if (!(tpe.isEmpty && qty.isEmpty && pn.isEmpty)) {
        hasValidRow = true
        if (tpe.isEmpty) missing += "Type"
        if (pn.isEmpty) missing += "Part Number"
        if (qty.isEmpty) missing += "Quantity"
        if (r.qty.text.nonEmpty && !qty.matches("^\\d+$")) invalid += "Quantity"
      }
    }
    val messages = Seq.newBuilder[String]
    if (missing.nonEmpty) messages += s"(${missing.mkString(", ")})"
    if (invalid.nonEmpty) messages += s"Invalid Data (${invalid.mkString(", ")})"
    val msgs = messages.result()
    (hasValidRow && msgs.isEmpty, msgs)
  }

  // ── W1 + C5 + C6: numbering, skip, routing (index.html:2331-2368) ───
  /** Emit classified+numbered rows in visual order. `lastItem` is the
    * per-conversation high-water mark. Rows missing qty or type are
    * skipped but still consume a visual index (itemNumber gaps match
    * the reference). Returns (rows, newMaxItem). */
  def numberAndRoute(staged: Seq[BomRowStaged], lastItem: Long): (Seq[BomRow], Long) = {
    var maxItem = lastItem
    val out = Seq.newBuilder[BomRow]
    for ((r, vRow) <- staged.zipWithIndex) {
      val qty = r.qty.text.trim
      val tpe = r.rowType.trim
      if (qty.nonEmpty && tpe.nonEmpty && (tpe == "Child Part" || tpe == "BO")) {
        val item = lastItem + vRow + 1
        maxItem = math.max(maxItem, item)
        out += BomRow(
          conv_id = r.conv_id,
          row_idx = vRow,
          item_number = item,
          row_type = tpe,
          matched = r.matched,
          quantity = qty,
          description = r.desc.text.trim,
          material = r.mat.text.trim,
          ocr_warning = rowWarning(r.qty, r.desc, r.mat, r.needsReview, r.similarity),
          needs_review = r.needsReview,
          similarity = r.similarity
        )
      }
    }
    (out.result(), maxItem)
  }

  /** C4 gate + W1/C5/C6: the reference validates the whole
    * spreadsheet before any write and a failed validation blocks the
    * submit entirely (frontend/index.html:2305-2315) — so an invalid
    * conversation emits nothing and its high-water mark stays put. */
  def gatedNumberAndRoute(staged: Seq[BomRowStaged], lastItem: Long): (Seq[BomRow], Long) =
    if (!validate(staged)._1) (Seq.empty, lastItem)
    else numberAndRoute(staged, lastItem)

  /** Full per-conversation assembly: positional zip of column cell
    * lists (J2, app.py:104-122 / index.html:1793-1804), J1 match, C1
    * classify. Missing positions become empty OCR cells with conf 0
    * (`newColumnData[i]?.text || ""`, index.html:1794-1795). */
  def assemble(
      columns: Map[String, Seq[Cell]],
      dict: Seq[String]): Seq[BomRowStaged] = {
    val nRows = if (columns.isEmpty) 0 else columns.valuesIterator.map(_.length).max
    (0 until nRows).map { i =>
      def f(label: String): OcrField = columns.get(label).flatMap(_.lift(i)) match {
        case Some(c) => OcrField(c.text, c.confidence, ocr = true)
        // a row past the end of a short column never gets the key set
        // (index.html:1793-1804) → undefined → text "", not OCR
        case None    => OcrField("", 0.0, ocr = false)
      }
      val part = f("PartNumber")
      val (matched, tpe, review, sim) = classify(part.text, dict)
      BomRowStaged("", i, part, f("Quantity"), f("Description"), f("Material"),
        matched, tpe, review, sim)
    }
  }
}

/** A spreadsheet row after assembly+classification, before numbering. */
final case class BomRowStaged(
    conv_id: String,
    row_idx: Int,
    part: OcrField,
    qty: OcrField,
    desc: OcrField,
    mat: OcrField,
    matched: String,
    rowType: String,
    needsReview: Boolean,
    similarity: Double
)
