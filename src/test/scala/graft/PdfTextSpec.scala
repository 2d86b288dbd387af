package graft

import java.util.zip.Deflater
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PdfText

object MiniPdf {
  /** Build a minimal single-page PDF whose content stream shows `lines`
    * one Tj per line. `compress` Flate-encodes the stream (the reference
    * invoices' encoding). */
  def apply(lines: Seq[String], compress: Boolean = false): Array[Byte] = {
    val esc = lines.map(_.replace("\\", "\\\\")
      .replace("(", "\\(").replace(")", "\\)"))
    // separator spaces are explicit space glyphs — extraction
    // concatenates show ops with no separator, as PyPDF2 does
    val content = "BT /F1 12 Tf 72 720 Td " +
      esc.map(l => s"($l) Tj 0 -14 Td").mkString(" ( ) Tj ") + " ET"
    val raw = content.getBytes("ISO-8859-1")
    val data = if (compress) deflate(raw) else raw
    val filter = if (compress) "/Filter /FlateDecode " else ""
    val head =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << $filter/Length ${data.length} >>
         |stream
         |""".stripMargin.getBytes("ISO-8859-1")
    val tail = "\nendstream\nendobj\n%%EOF\n".getBytes("ISO-8859-1")
    head ++ data ++ tail
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val out = new Array[Byte](b.length * 2 + 64)
    val n = d.deflate(out)
    d.end()
    out.take(n)
  }
}

class PdfTextSpec extends AnyFunSuite {

  test("extracts Tj strings from an uncompressed PDF") {
    val pdf = MiniPdf(Seq("Customer: 42", "Total 370.35"))
    assert(PdfText.extract(pdf) === "Customer: 42 Total 370.35")
  }

  test("extracts from a FlateDecode-compressed stream") {
    val pdf = MiniPdf(Seq("Invoice #: INV-00000007", "Status: Overdue"),
      compress = true)
    assert(PdfText.extract(pdf) ===
      "Invoice #: INV-00000007 Status: Overdue")
  }

  test("handles escapes and TJ arrays") {
    val content = """BT [(He) (llo \(world\))] TJ ( ) Tj (lit\\eral) Tj ET"""
    val pdf = ("1 0 obj << /Length " + content.length + " >>\nstream\n" +
      content + "\nendstream\nendobj").getBytes("ISO-8859-1")
    // TJ array elements concatenate directly (kerning splits words);
    // the space between the two show ops is an explicit space glyph
    assert(PdfText.extract(pdf) === "Hello (world) lit\\eral")
  }

  test("decodes a real reference invoice through its ToUnicode CMaps") {
    // reference corpus: subset-embedded Calibri with per-font
    // /ToUnicode CMaps (code/ingest/3B1_pdf_to_text_udf.sql PyPDF2 path)
    val f = java.nio.file.Paths.get(
      "/root/reference/data/invoice/INVOICE_NO_INV-0A0GQ-54_7142.pdf")
    assume(java.nio.file.Files.exists(f))
    val text = PdfText.extract(java.nio.file.Files.readAllBytes(f))
    assert(text.contains("Customer: 1957842986"), text.take(200))
    assert(text.contains("Invoice #: INV-0A0GQ-54"), text.take(300))
    assert(text.contains("Name: Wesley Kim"), text.take(200))
    assert(text.contains("Generated On: 2023-02-26T19:39:11Z"))
    assert(text.contains("Item 1 $1,334.24"))
  }

  test("null and garbage bytes do not throw") {
    assert(PdfText.extract(null) === null)
    assert(PdfText.extract(Array[Byte](1, 2, 3)) === "")
  }

  test("malformed octal escape \\89 degrades instead of throwing") {
    val content = """BT (a\89b) Tj (\101ok) Tj ET"""
    val pdf = ("1 0 obj << /Length " + content.length + " >>\nstream\n" +
      content + "\nendstream\nendobj").getBytes("ISO-8859-1")
    // \8 is not octal → the escape consumes nothing valid; \101 = 'A'
    val out = PdfText.extract(pdf)
    assert(out.contains("b") && out.contains("Aok"), out)
  }
}
