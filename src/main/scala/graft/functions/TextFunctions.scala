package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar text-standardization functions (SURVEY.md §2.8, F1–F14).
  * All are compositions of built-in codegen'd functions — no UDFs — so
  * they stay inside whole-stage codegen and behave identically at any
  * scale.
  */
object TextFunctions {

  /** Phone standardization — reference code/curate/02_customer_sp.sql:24-26.
    * Keeps the reference's exact char class `[^0-9_]` (underscores
    * survive), then drops a leading "1" country code and truncates to 10.
    */
  def cleanPhone(c: Column): Column = {
    val digits = regexp_replace(c, "[^0-9_]", "")
    when(digits.startsWith("1"), digits.substr(2, 10))
      .otherwise(digits.substr(1, 10))
  }

  /** First name = chars before the first space — reference 02:27.
    * Single-token names yield "" (position 0 → length -1 → empty), the
    * reference's exact edge semantics. */
  def firstName(name: Column): Column =
    name.substr(lit(1), instr(name, " ") - 1)

  /** Last name = chars after the first space; whole string when no space
    * — reference 02:28. */
  def lastName(name: Column): Column =
    name.substr(instr(name, " ") + 1, length(name))

  /** Currency-format parse `TO_NUMBER(s,'$999,999.99',38,2)` — reference
    * 3BC_create_raw_pdf_text_view.sql:8-10. */
  def money(c: Column): Column =
    to_number(c, lit("$999,999.99")).cast(DecimalType(38, 2))

  /** Labeled-field extraction from invoice raw text — the reference's
    * parsing view (3BC_create_raw_pdf_text_view.sql:2-11 and
    * 03_invoice_sp.sql:27), exactly its split_part chains:
    * token 2 after each label; status = text between "Status:" and
    * "Payment"; missing label → empty string (split_part out-of-range).
    */
  def invoiceFields(text: Column): Seq[Column] = {
    def after(label: String): Column =
      split_part(split_part(text, lit(label), lit(2)), lit(" "), lit(2))
    Seq(
      lpad(after("Customer:"), 10, "0").as("customer_id"),
      after("Invoice #:").as("invoice_num"),
      after("Generated On:").as("inv_gen_dt"),
      trim(split_part(split_part(text, lit("Status:"), lit(2)),
        lit("Payment"), lit(1))).as("inv_status"),
      after("Payment Date:").as("payment_dt"),
      money(after("Item 1")).as("item_1"),
      money(after("Item 2")).as("item_2"),
      money(after("Item 3")).as("item_3"),
      after("Total").cast(DecimalType(38, 2)).as("total"))
  }
}
