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
  * `[(…) …] TJ`, with PDF string escapes (\\, \(, \), \n, \r, \t, \ddd).
  * Subset-embedded fonts without a ToUnicode CMap produce garbage — the
  * same practical limit PyPDF2's extractText has; the operator contract
  * is "binary → text", exercised on standard-encoded documents.
  */
object PdfText {

  def extract(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val streams = contentStreams(bytes)
    val out = new StringBuilder
    streams.foreach { data =>
      val text = showOps(new String(data, "ISO-8859-1"))
      if (text.nonEmpty) {
        if (out.nonEmpty) out.append(' ')
        out.append(text)
      }
    }
    out.toString
  }

  /** All `stream … endstream` payloads, inflated when zlib-compressed. */
  private def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val hay = new String(bytes, "ISO-8859-1")
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

  /** Concatenate the strings shown by Tj / ' / TJ operators, in stream
    * order, separated by single spaces. */
  private def showOps(content: String): String = {
    val parts = ArrayBuffer.empty[String]
    var i = 0
    while (i < content.length) {
      content.charAt(i) match {
        case '(' =>
          val (s, next) = pdfString(content, i)
          // Only keep strings consumed by a show operator (Tj, ', TJ end).
          val rest = content.drop(next).take(24)
          val isShown = rest.dropWhile(_.isWhitespace).take(2) match {
            case t if t.startsWith("Tj") || t.startsWith("'") => true
            case _ => inArray(content, i)
          }
          if (isShown && s.nonEmpty) parts += s
          i = next
        case '%' => // comment: skip to EOL
          while (i < content.length && content.charAt(i) != '\n') i += 1
        case _ => i += 1
      }
    }
    parts.mkString(" ")
  }

  /** Is the string at position `i` inside a `[ … ] TJ` array? */
  private def inArray(content: String, i: Int): Boolean = {
    val before = content.lastIndexWhere(c => c == '[' || c == ']', i)
    if (before < 0 || content.charAt(before) != '[') return false
    val close = content.indexOf(']', i)
    close >= 0 &&
      content.drop(close + 1).dropWhile(_.isWhitespace).startsWith("TJ")
  }

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
