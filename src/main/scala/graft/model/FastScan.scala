package graft.model

/** Hand-rolled JSON scanner specialized to the payload grammar
  * (PayloadCodec): standard JSON syntax, but tuned for the known
  * field set and flat numeric arrays. Any construct it cannot handle
  * cheaply (exotic escapes aside — those ARE handled) throws
  * [[FastScan.Bail]] and the caller falls back to jackson, so
  * correctness never depends on this class alone. One instance per
  * parse; instances are cheap (no allocation beyond the output).
  */
final class FastScan(s: String) {
  import FastScan.Bail

  private var i = 0
  private val n = s.length

  def parse(): Payload = {
    var boxes: Array[Box] = PayloadCodec.empty.boxes
    var w = 0
    var h = 0
    var lines: Array[Int] = Array.empty
    var rects: Array[Rect] = Array.empty
    var col = ""
    ws()
    expect('{')
    var first = true
    ws()
    if (peek() == '}') { i += 1; return Payload(boxes, w, h, lines, rects, col) }
    while (first || { ws(); peek() == ',' }) {
      if (!first) i += 1 // consume ','
      first = false
      ws()
      val k = key()
      ws(); expect(':'); ws()
      k match {
        case "boxes" => boxes = parseBoxes()
        case "w"     => w = int()
        case "h"     => h = int()
        case "lines" => lines = intArray()
        case "rects" => rects = parseRects()
        case "col"   => col = string()
        case _       => skipValue()
      }
    }
    ws(); expect('}')
    Payload(boxes, w, h, lines, rects, col)
  }

  // ── primitives ────────────────────────────────────────────────────

  @inline private def peek(): Char = if (i < n) s.charAt(i) else '\u0000'

  @inline private def ws(): Unit =
    while (i < n && { val c = s.charAt(i); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1

  @inline private def expect(c: Char): Unit = {
    if (i >= n || s.charAt(i) != c) throw Bail
    i += 1
  }

  /** Read an object KEY without allocating when it is one of the
    * payload grammar's known names (profiling: key substrings were a
    * top allocation source — 3 keys per box, ~8.5 boxes per turn).
    * Escaped keys fall back to the decoding slow path, so an escaped
    * spelling of a known key still matches. */
  private def key(): String = {
    expect('"')
    val start = i
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') {
        val end = i
        i += 1
        val len = end - start
        if (len == 1) {
          s.charAt(start) match {
            case 'q' => return "q"
            case 't' => return "t"
            case 'c' => return "c"
            case 'w' => return "w"
            case 'h' => return "h"
            case _   => ()
          }
        } else if (len == 5) {
          if (s.regionMatches(start, "boxes", 0, 5)) return "boxes"
          if (s.regionMatches(start, "lines", 0, 5)) return "lines"
          if (s.regionMatches(start, "rects", 0, 5)) return "rects"
        } else if (len == 3 && s.regionMatches(start, "col", 0, 3)) return "col"
        return s.substring(start, end)
      }
      if (c == '\\') return stringSlow(start)
      if (c < ' ') throw Bail
      i += 1
    }
    throw Bail
  }

  private def string(): String = {
    expect('"')
    val start = i
    // fast path: no escapes
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') { val out = s.substring(start, i); i += 1; return out }
      if (c == '\\') return stringSlow(start)
      if (c < ' ') throw Bail // raw control char: invalid JSON, let jackson reject
      i += 1
    }
    throw Bail
  }

  private def stringSlow(start: Int): String = {
    val sb = new java.lang.StringBuilder(16)
    sb.append(s, start, i)
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') { i += 1; return sb.toString }
      else if (c == '\\') {
        i += 1
        if (i >= n) throw Bail
        s.charAt(i) match {
          case '"'  => sb.append('"')
          case '\\' => sb.append('\\')
          case '/'  => sb.append('/')
          case 'b'  => sb.append('\b')
          case 'f'  => sb.append('\f')
          case 'n'  => sb.append('\n')
          case 'r'  => sb.append('\r')
          case 't'  => sb.append('\t')
          case 'u' =>
            if (i + 4 >= n) throw Bail
            sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
            i += 4
          case _ => throw Bail
        }
        i += 1
      } else if (c < ' ') throw Bail // raw control char: let jackson reject
      else { sb.append(c); i += 1 }
    }
    throw Bail
  }

  /** number as double; integer fast path is exact (long arithmetic),
    * anything fractional/exponential defers to Double.parseDouble on
    * the exact substring — bit-identical to jackson. */
  private def number(): Double = {
    val start = i
    var neg = false
    if (peek() == '-') { neg = true; i += 1 }
    val digStart = i
    var l = 0L
    var digits = 0
    var d0 = if (i < n) s.charAt(i) else ' '
    while (d0 >= '0' && d0 <= '9') {
      l = l * 10 + (d0 - '0')
      digits += 1
      i += 1
      d0 = if (i < n) s.charAt(i) else ' '
    }
    if (digits == 0) throw Bail
    // "007": leading zero in the integer part is invalid JSON — Bail
    // so jackson decides (it rejects → empty payload)
    if (digits > 1 && s.charAt(digStart) == '0') throw Bail
    val c = peek()
    if (c == '.' || c == 'e' || c == 'E') {
      // strict JSON grammar: '.' needs ≥1 digit after it, 'e' needs an
      // optional sign then ≥1 digit. A loose scan + parseDouble is NOT
      // equivalent: parseDouble accepts "0." that jackson rejects
      var fdigits = 0
      if (c == '.') {
        i += 1
        var f0 = if (i < n) s.charAt(i) else ' '
        while (f0 >= '0' && f0 <= '9') {
          // keep extending the integer mantissa while it stays exact;
          // past the fast-path bound only position/validation matter
          if (digits + fdigits < 18) l = l * 10 + (f0 - '0')
          i += 1; fdigits += 1
          f0 = if (i < n) s.charAt(i) else ' '
        }
        if (fdigits == 0) throw Bail
      }
      val e = peek()
      if (e == 'e' || e == 'E') {
        i += 1
        if (peek() == '+' || peek() == '-') i += 1
        var edigits = 0
        while (i < n && { val ch = s.charAt(i); ch >= '0' && ch <= '9' }) {
          i += 1; edigits += 1
        }
        if (edigits == 0) throw Bail
        java.lang.Double.parseDouble(s.substring(start, i))
      } else if (digits + fdigits <= 15) {
        // exact fast path for plain decimals (the payload's box
        // coordinates): the mantissa ≤ 10^15 < 2^53 and 10^fdigits
        // (fdigits ≤ 15 < 23) are both EXACT doubles, and IEEE
        // division returns the correctly-rounded quotient — which is
        // precisely Double.parseDouble's contract — so this is
        // bit-identical to the jackson path while skipping
        // FloatingDecimal entirely (a top profile entry).
        val v = l / FastScan.Pow10(fdigits)
        if (neg) -v else v
      } else java.lang.Double.parseDouble(s.substring(start, i))
    } else if (digits > 17) {
      java.lang.Double.parseDouble(s.substring(start, i))
    } else if (neg) -l.toDouble
    else l.toDouble
  }

  private def int(): Int = {
    val d = number()
    // jackson's getIntValue errors on out-of-range (→ empty payload):
    // defer to it rather than saturating
    if (d > Int.MaxValue || d < Int.MinValue) throw Bail
    d.toInt
  }

  private def intArray(): Array[Int] = {
    expect('[')
    ws()
    if (peek() == ']') { i += 1; return Array.empty }
    val buf = new java.util.ArrayList[Integer](16)
    var more = true
    while (more) {
      ws()
      buf.add(int())
      ws()
      if (peek() == ',') i += 1 else more = false
    }
    expect(']')
    val out = new Array[Int](buf.size)
    var k = 0
    while (k < out.length) { out(k) = buf.get(k); k += 1 }
    out
  }

  private def parseBoxes(): Array[Box] = {
    expect('[')
    ws()
    if (peek() == ']') { i += 1; return Array.empty }
    val buf = new java.util.ArrayList[Box](16)
    var more = true
    while (more) {
      ws()
      buf.add(parseBox())
      ws()
      if (peek() == ',') i += 1 else more = false
    }
    expect(']')
    buf.toArray(new Array[Box](buf.size))
  }

  private def parseBox(): Box = {
    expect('{')
    var q: Array[Double] = null
    var t = ""
    var c = 0.0
    var first = true
    ws()
    if (peek() == '}') { i += 1; throw Bail } // box without fields: let jackson decide
    while (first || { ws(); peek() == ',' }) {
      if (!first) i += 1
      first = false
      ws()
      val k = key()
      ws(); expect(':'); ws()
      k match {
        case "q" => q = quad()
        case "t" => t = string()
        case "c" => c = number()
        case _   => skipValue()
      }
    }
    ws(); expect('}')
    if (q == null || q.length != 8) throw Bail // mirror jackson-path guard
    Box(q(0), q(1), q(2), q(3), q(4), q(5), q(6), q(7), t, c)
  }

  /** [[x,y],[x,y],[x,y],[x,y]] — same fill-with-zero tolerance as the
    * jackson path (readQuad). */
  private def quad(): Array[Double] = {
    val out = new Array[Double](8)
    var k = 0
    expect('[')
    ws()
    if (peek() == ']') { i += 1; return out }
    var moreOuter = true
    while (moreOuter) {
      ws(); expect('[')
      ws()
      if (peek() != ']') {
        var moreInner = true
        while (moreInner) {
          ws()
          val v = number()
          if (k < 8) { out(k) = v; k += 1 }
          ws()
          if (peek() == ',') i += 1 else moreInner = false
        }
      }
      expect(']')
      ws()
      if (peek() == ',') i += 1 else moreOuter = false
    }
    expect(']')
    out
  }

  private def parseRects(): Array[Rect] = {
    expect('[')
    ws()
    if (peek() == ']') { i += 1; return Array.empty }
    val buf = new java.util.ArrayList[Rect](8)
    var more = true
    while (more) {
      ws(); expect('[')
      val v = new Array[Int](4)
      var k = 0
      ws()
      if (peek() != ']') {
        var moreInner = true
        while (moreInner) {
          ws()
          val x = int()
          if (k < 4) { v(k) = x; k += 1 }
          ws()
          if (peek() == ',') i += 1 else moreInner = false
        }
      }
      expect(']')
      buf.add(Rect(v(0), v(1), v(2), v(3)))
      ws()
      if (peek() == ',') i += 1 else more = false
    }
    expect(']')
    buf.toArray(new Array[Rect](buf.size))
  }

  /** skip any JSON value (unknown keys) */
  private def skipValue(): Unit = {
    ws()
    peek() match {
      case '"' => string(); ()
      case '{' =>
        i += 1
        var depth = 1
        while (depth > 0) {
          if (i >= n) throw Bail
          s.charAt(i) match {
            case '"'        => string()
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' => depth -= 1; i += 1
            case _          => i += 1
          }
        }
      case '[' =>
        i += 1
        var depth = 1
        while (depth > 0) {
          if (i >= n) throw Bail
          s.charAt(i) match {
            case '"'        => string()
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' => depth -= 1; i += 1
            case _          => i += 1
          }
        }
      case 't' => expectLit("true")
      case 'f' => expectLit("false")
      case 'n' => expectLit("null")
      case _   => number(); ()
    }
  }

  /** validate a true/false/null literal in full (a blind skip would
    * accept `tru}` that jackson rejects). */
  private def expectLit(lit: String): Unit = {
    if (i + lit.length > n || !s.regionMatches(i, lit, 0, lit.length)) throw Bail
    i += lit.length
  }
}

object FastScan {
  /** 10^k as exact doubles (k ≤ 15 used by the number fast path) */
  private[model] val Pow10: Array[Double] =
    Array.tabulate(16)(k => math.pow(10.0, k))

  /** control-flow exception: "let jackson handle this input" */
  object Bail extends RuntimeException("fastscan-bail") {
    override def fillInStackTrace(): Throwable = this
  }
}
