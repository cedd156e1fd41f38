package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII detection signals — the redaction/filtering pre-pass every
  * public-corpus pipeline runs before training: per-document counts of
  * email addresses, IPv4 addresses, SSN-shaped and phone-shaped numbers,
  * and payment-card candidates with a REAL Luhn checksum validation
  * (digit-shape alone flags order ids and timestamps; the checksum is
  * what separates "16 digits" from "a probable card number").
  *
  * Scale shape: one row-local projection — codegen'd regexp extraction +
  * bounded HOFs over the per-doc match lists; no shuffle, no UDF. The
  * regex dialect sticks to the RE2 ∩ java.util.regex subset
  * (\\b, \\d, character classes, bounded repeats) so the DuckDB oracle
  * runs the identical patterns.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val CardRe = "\\b\\d{13,19}\\b"

  /** Luhn checksum over a digit string: from the RIGHT, double every
    * second digit (subtracting 9 past 9) and require the sum ≡ 0 mod 10.
    * Pure integer HOF arithmetic — bit-portable by construction. */
  def luhnValid(digits: Column): Column = {
    val terms = transform(reverse(split(digits, "")), (d0, i) => {
      val d = d0.cast(LongType)
      when(i % 2 === 0, d)
        .otherwise(when(d * 2L > 9L, d * 2L - 9L).otherwise(d * 2L))
    })
    pmod(aggregate(terms, lit(0L), (a, x) => a + x), lit(10L)) === 0L
  }

  /** Per-document PII signal counts + the `has_pii` verdict. Card
    * candidates are 13-19 digit runs; `cards_valid` counts the ones that
    * pass Luhn (the ones a redactor must treat as live).
    *
    * @return (idCol, emails, ipv4, ssn, phones, cards, cards_valid,
    *         has_pii)
    */
  def piiSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val cards = regexp_extract_all(t, lit(CardRe), lit(0))
    df.select(col(idCol),
        size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast(LongType).as("emails"),
        size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast(LongType).as("ipv4"),
        size(regexp_extract_all(t, lit(SsnRe), lit(0))).cast(LongType).as("ssn"),
        size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast(LongType).as("phones"),
        size(cards).cast(LongType).as("cards"),
        size(filter(cards, c => luhnValid(c))).cast(LongType).as("cards_valid"))
      .withColumn("has_pii",
        col("emails") + col("ipv4") + col("ssn") + col("phones") +
          col("cards_valid") > 0L)
  }
}
