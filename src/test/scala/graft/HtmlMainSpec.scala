package graft

import graft.kernel.HtmlMain
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins the round-4 allocation-optimized segmenter against an
  * INDEPENDENTLY-STRUCTURED reference implementation re-derived from
  * the documented semantics (a two-phase lexer → fold, vs production's
  * single-pass scanner with in-place tag matching). The production
  * optimizations (no per-tag substring/toLowerCase, inline whitespace
  * collapse) were argued behavior-equivalent; this sweeps corpus HTML
  * and random tag soup to make the argument mechanical.
  */
class HtmlMainSpec extends AnyFunSuite {

  // ── reference implementation (clarity over speed) ─────────────────
  private object Ref {
    sealed trait Ev
    case class Txt(c: Char) extends Ev
    case class Tag(name: String, isEnd: Boolean) extends Ev

    private val blockTags = Set(
      "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
      "table", "tr", "td", "th", "thead", "tbody", "blockquote", "pre",
      "article", "section", "header", "footer", "nav", "aside", "main",
      "form", "fieldset", "hr", "br", "title", "body", "html", "head",
      "figure", "figcaption", "dl", "dt", "dd")
    private val skipTags = Set("script", "style", "noscript", "option", "textarea")

    /** phase 1: lex into text/tag events (comments dropped, entities
      * decoded, unknown entities pass '&' through) */
    def lex(html: String): Vector[Ev] = {
      val out = Vector.newBuilder[Ev]
      var i = 0
      val n = html.length
      while (i < n) {
        val c = html.charAt(i)
        if (c == '<') {
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val close = html.indexOf('>', i + 1)
            if (close < 0) i = n
            else {
              val inner = html.substring(i + 1, close)
              val isEnd = inner.startsWith("/")
              val body = if (isEnd) inner.drop(1) else inner
              val name = body.takeWhile(ch =>
                ch != ' ' && ch != '\t' && ch != '\n' && ch != '\r' && ch != '/')
                .toLowerCase
              out += Tag(name, isEnd)
              i = close + 1
            }
          }
        } else if (c == '&') {
          val semi = html.indexOf(';', i + 1)
          if (semi < 0 || semi - i > 10) { out += Txt('&'); i += 1 }
          else {
            val body = html.substring(i + 1, semi)
            val decoded: Option[Char] = body match {
              case "amp" => Some('&'); case "lt" => Some('<')
              case "gt" => Some('>'); case "quot" => Some('"')
              case "apos" => Some('\''); case "nbsp" => Some(' ')
              case b if b.startsWith("#x") || b.startsWith("#X") =>
                try Some(Integer.parseInt(b.substring(2), 16).toChar)
                catch { case _: Exception => None }
              case b if b.startsWith("#") =>
                try Some(Integer.parseInt(b.substring(1)).toChar)
                catch { case _: Exception => None }
              case _ => None
            }
            decoded match {
              case Some(d) => out += Txt(d); i = semi + 1
              case None    => out += Txt('&'); i += 1
            }
          }
        } else { out += Txt(c); i += 1 }
      }
      out.result()
    }

    /** phase 2: fold events into blocks per the documented semantics */
    def segment(html: String): Vector[(String, Int, Int)] = {
      val blocks = Vector.newBuilder[(String, Int, Int)]
      var text = Vector.empty[Char]
      var words, anchorWords, anchorDepth, skipDepth = 0
      var inWord, wordIsAnchor = false
      def endWord(): Unit = if (inWord) {
        words += 1; if (wordIsAnchor) anchorWords += 1; inWord = false
      }
      def flush(): Unit = {
        endWord()
        val t = text.mkString.trim.replaceAll(" +", " ")
        if (t.nonEmpty) blocks += ((t, words, anchorWords))
        text = Vector.empty; words = 0; anchorWords = 0
      }
      for (ev <- lex(html)) ev match {
        case Tag(name, isEnd) =>
          if (skipTags(name)) {
            if (!isEnd) skipDepth += 1 else if (skipDepth > 0) skipDepth -= 1
          } else if (skipDepth == 0) {
            if (name == "a") {
              endWord()
              if (!isEnd) anchorDepth += 1 else if (anchorDepth > 0) anchorDepth -= 1
            } else if (blockTags(name)) flush()
            else endWord()
          }
        case Txt(c) if skipDepth == 0 =>
          if (Character.isWhitespace(c)) { endWord(); text :+= ' ' }
          else {
            if (!inWord) { inWord = true; wordIsAnchor = anchorDepth > 0 }
            text :+= c
          }
        case _ => ()
      }
      flush()
      blocks.result()
    }
  }

  private def prod(html: String): Vector[(String, Int, Int)] =
    HtmlMain.segment(html).toVector.map(b => (b.text, b.numWords, b.numAnchorWords))

  test("segment equals the independent reference on corpus HTML") {
    val corpus = graft.gen.TranscriptGen.corpus(nConvs = 40)
    val htmls = corpus.turns.filter(_.tool == graft.model.Tool.HtmlMain).map(_.text)
    assert(htmls.nonEmpty)
    for (h <- htmls) assert(prod(h) == Ref.segment(h), h.take(120))
  }

  test("segment equals the independent reference on random tag soup") {
    val pieces = Array(
      "<p>", "</p>", "<div class='x'>", "</div>", "<a>", "</a>",
      "<A HREF='y'>", "<script>", "</script>", "<SCRIPT>", "<br/>",
      "<br />", "<!-- note -->", "<!--", "-->", "<span>", "</span>",
      "<Table>", "</tAbLe>", "<li/>", "<>", "</>", "<em", "&amp;",
      "&unknown;", "&#65;", "&#x42;", "&#xzz;", "&nbsp;", "&", ";",
      "word", "two words", " ", "  ", "\n", "\t", "x", "<", ">",
      "ab<b>cd", "1,2", "ø")
    val rnd = new Random(4242L)
    for (trial <- 0 until 4000) {
      val soup = Seq.fill(rnd.nextInt(40))(pieces(rnd.nextInt(pieces.length))).mkString
      assert(prod(soup) == Ref.segment(soup), s"trial $trial: ${soup.take(160)}")
    }
  }
}
