package graft.functions

import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Minimal pure-Scala PDF text extraction — the reference's
  * binary-column → text-column scalar UDF (code/ingest/
  * 3B1_pdf_to_text_udf.sql:1-20, PyPDF2 page-0 extractText) without any
  * PDF library (none ships in this environment).
  *
  * Scope: content streams (raw or FlateDecode — zlib inflate via
  * java.util.zip), text-showing operators `(…) Tj`, `(…) '` and
  * `[(…) …] TJ`, with PDF string escapes (\\, \(, \), \n, \r, \t, \ddd),
  * and subset-font decoding through per-font /ToUnicode CMaps
  * (beginbfchar + beginbfrange, single-byte codespace — the reference
  * invoices' exact shape): the scanner tracks the current font across
  * `/Name size Tf` operators and maps each shown byte through that
  * font's CMap, falling back to identity (Latin-1) for unmapped codes
  * and CMap-less fonts. All shown strings concatenate with NO separator
  * (kerning adjustments split words mid-glyph; spaces are real space
  * glyphs) — PyPDF2 1.x extractText's exact behavior, which the
  * reference's split_part label chains depend on ("Customer:" only
  * appears contiguously under concatenation).
  */
object PdfText {

  def extract(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val hay = new String(bytes, "ISO-8859-1")
    val fonts = fontMaps(bytes, hay)
    val streams = contentStreams(bytes, hay)
    val out = new StringBuilder
    streams.foreach { data =>
      val text = showOps(new String(data, "ISO-8859-1"), fonts)
      if (text.nonEmpty) {
        if (out.nonEmpty) out.append(' ')
        out.append(text)
      }
    }
    out.toString
  }

  // ---- object graph -----------------------------------------------------

  /** Span (start, end) of `num 0 obj … endobj` in `hay`, if present. */
  private def objBody(hay: String, num: Int): Option[(Int, Int)] = {
    val pat = s"$num 0 obj"
    var i = hay.indexOf(pat)
    // reject suffix matches like "11 0 obj" when searching for "1 0 obj"
    while (i > 0 && hay.charAt(i - 1).isDigit) i = hay.indexOf(pat, i + 1)
    if (i < 0) None
    else {
      val end = hay.indexOf("endobj", i)
      Some((i + pat.length, if (end < 0) hay.length else end))
    }
  }

  /** Decoded stream payload of object `num`, if it has one. */
  private def objStream(bytes: Array[Byte], hay: String,
                        num: Int): Option[Array[Byte]] =
    objBody(hay, num).flatMap { case (a, b) =>
      val i = hay.indexOf("stream", a)
      if (i < 0 || i >= b) None
      else {
        var start = i + "stream".length
        if (start < hay.length && hay.charAt(start) == '\r') start += 1
        if (start < hay.length && hay.charAt(start) == '\n') start += 1
        val end = hay.indexOf("endstream", start)
        if (end < 0) None else Some(inflateIfZlib(bytes.slice(start, end)))
      }
    }

  private val FontDict = """(?s)/Font\s*<<(.*?)>>""".r
  private val FontRef = """/(\w+)\s+(\d+)\s+0\s+R""".r
  private val ToUnicodeRef = """/ToUnicode\s+(\d+)\s+0\s+R""".r

  /** Resource font name (e.g. "TT2") → byte-code → unicode string, from
    * each font's /ToUnicode CMap. Fonts without a CMap map to empty
    * (identity fallback at decode time). */
  private def fontMaps(bytes: Array[Byte],
                       hay: String): Map[String, Map[Int, String]] = {
    val out = scala.collection.mutable.Map.empty[String, Map[Int, String]]
    for {
      dict <- FontDict.findAllMatchIn(hay).map(_.group(1))
      ref <- FontRef.findAllMatchIn(dict)
    } {
      val name = ref.group(1)
      if (!out.contains(name)) {
        val cmap = for {
          (a, b) <- objBody(hay, ref.group(2).toInt)
          tu <- ToUnicodeRef.findFirstMatchIn(hay.substring(a, b))
          data <- objStream(bytes, hay, tu.group(1).toInt)
        } yield parseCMap(new String(data, "ISO-8859-1"))
        out(name) = cmap.getOrElse(Map.empty)
      }
    }
    out.toMap
  }

  // ---- ToUnicode CMap ---------------------------------------------------

  private val BfChar = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRange = """(?s)beginbfrange(.*?)endbfrange""".r
  private val CharEntry = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val RangeEntry =
    """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*(<[0-9a-fA-F]+>|\[[^\]]*\])""".r
  private val HexToken = """<([0-9a-fA-F]+)>""".r

  private def utf16(hex: String): String = {
    val padded = if (hex.length % 4 == 0) hex
      else ("0" * (4 - hex.length % 4)) + hex
    new String(padded.grouped(4).toArray
      .map(h => Integer.parseInt(h, 16).toChar))
  }

  /** bfchar + bfrange entries with single-byte source codes (the
    * reference invoices declare codespacerange <00><FF>); wider source
    * codes are skipped. Range targets support both the `<start>`
    * increment form and the `[<d1> <d2> …]` array form. */
  private def parseCMap(cs: String): Map[Int, String] = {
    val m = scala.collection.mutable.Map.empty[Int, String]
    for {
      block <- BfChar.findAllMatchIn(cs).map(_.group(1))
      e <- CharEntry.findAllMatchIn(block)
    } if (e.group(1).length <= 2) m(Integer.parseInt(e.group(1), 16)) =
      utf16(e.group(2))
    for {
      block <- BfRange.findAllMatchIn(cs).map(_.group(1))
      e <- RangeEntry.findAllMatchIn(block)
    } if (e.group(1).length <= 2) {
      val lo = Integer.parseInt(e.group(1), 16)
      val hi = Integer.parseInt(e.group(2), 16)
      val dst = e.group(3)
      if (dst.startsWith("<")) {
        val start = Integer.parseInt(dst.tail.init, 16)
        for (c <- lo to hi) m(c) = (start + c - lo).toChar.toString
      } else {
        val targets = HexToken.findAllMatchIn(dst).map(_.group(1)).toArray
        for ((h, k) <- targets.zipWithIndex if lo + k <= hi)
          m(lo + k) = utf16(h)
      }
    }
    m.toMap
  }

  // ---- streams ----------------------------------------------------------

  /** All `stream … endstream` payloads, inflated when zlib-compressed. */
  private def contentStreams(bytes: Array[Byte],
                             hay: String): Seq[Array[Byte]] = {
    val found = ArrayBuffer.empty[Array[Byte]]
    var from = 0
    while ({ val i = hay.indexOf("stream", from); i >= 0 }) {
      val i = hay.indexOf("stream", from)
      var start = i + "stream".length
      if (start < hay.length && hay.charAt(start) == '\r') start += 1
      if (start < hay.length && hay.charAt(start) == '\n') start += 1
      val end = hay.indexOf("endstream", start)
      if (end < 0) { from = hay.length }
      else {
        val raw = bytes.slice(start, end)
        found += inflateIfZlib(raw)
        from = end + "endstream".length
      }
    }
    found.toSeq
  }

  private def inflateIfZlib(raw: Array[Byte]): Array[Byte] = {
    val looksZlib = raw.length > 2 && (raw(0) & 0xff) == 0x78
    if (!looksZlib) return raw
    try {
      val inf = new Inflater()
      inf.setInput(raw)
      val out = new ArrayBuffer[Byte]()
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return raw
        out ++= buf.take(n)
      }
      inf.end()
      out.toArray
    } catch { case _: Exception => raw }
  }

  // ---- content-stream scanner -------------------------------------------

  /** Concatenate the strings shown by Tj / ' / TJ operators in stream
    * order with no separator (PyPDF2 1.x extractText semantics),
    * decoding each through the current font's CMap. */
  private def showOps(content: String,
                      fonts: Map[String, Map[Int, String]]): String = {
    val parts = ArrayBuffer.empty[String]
    var pendingName: String = null
    var curMap: Map[Int, String] = Map.empty
    def decode(s: String): String =
      if (curMap.isEmpty) s
      else s.map(c => curMap.getOrElse(c.toInt, c.toString)).mkString
    var i = 0
    while (i < content.length) {
      content.charAt(i) match {
        case '/' =>
          val j = (i + 1 to content.length).find(k =>
            k == content.length || !isNameChar(content.charAt(k))).get
          pendingName = content.substring(i + 1, j)
          i = j
        case 'T' if i + 1 < content.length && content.charAt(i + 1) == 'f' &&
            (i + 2 >= content.length ||
              !content.charAt(i + 2).isLetterOrDigit) =>
          if (pendingName != null)
            curMap = fonts.getOrElse(pendingName, Map.empty)
          i += 2
        case '[' =>
          // gather strings to ']'; emit joined only if the operator is TJ
          val buf = new StringBuilder
          var j = i + 1
          var sawString = false
          while (j < content.length && content.charAt(j) != ']') {
            if (content.charAt(j) == '(') {
              val (s, next) = pdfString(content, j)
              buf.append(decode(s))
              sawString = true
              j = next
            } else j += 1
          }
          val after = content.drop(j + 1).dropWhile(_.isWhitespace)
          if (sawString && after.startsWith("TJ")) {
            if (buf.nonEmpty) parts += buf.toString
            i = j + 1
          } else i += 1
        case '(' =>
          val (s, next) = pdfString(content, i)
          val rest = content.drop(next).dropWhile(_.isWhitespace).take(2)
          if ((rest.startsWith("Tj") || rest.startsWith("'")) && s.nonEmpty)
            parts += decode(s)
          i = next
        case '%' => // comment: skip to EOL
          while (i < content.length && content.charAt(i) != '\n') i += 1
        case _ => i += 1
      }
    }
    parts.mkString
  }

  private def isNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '.' || c == '+' || c == '-'

  /** Parse a PDF literal string starting at `(`; returns (text, posAfter). */
  private def pdfString(s: String, open: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => out.append('\n'); i += 2
            case 'r' => out.append('\r'); i += 2
            case 't' => out.append('\t'); i += 2
            case 'b' => out.append('\b'); i += 2
            case 'f' => out.append('\f'); i += 2
            case c @ ('(' | ')' | '\\') => out.append(c); i += 2
            case d if d >= '0' && d <= '7' =>
              // octal digits only — \89 is malformed and must degrade,
              // not throw (one bad file must not kill the curation job)
              val oct = s.drop(i + 1).take(3).takeWhile(c =>
                c >= '0' && c <= '7')
              out.append(Integer.parseInt(oct, 8).toChar)
              i += 1 + oct.length
            case _ => i += 1 // line continuation / unknown escape
          }
        case '(' => depth += 1; out.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.append(')')
          i += 1
        case c => out.append(c); i += 1
      }
    }
    (out.toString, i)
  }
}
