package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every training-data
  * pipeline runs before text leaves the ingest tier (the C4/RefinedWeb
  * "remove lines with personal data" family, in whole-match form).
  *
  * Patterns are written in the common subset of Java `util.regex` and the
  * RE2 family (no lookaround, no backreferences, `(?:...)` groups only) so
  * the SAME pattern string produces the SAME matches in this engine and in
  * the DuckDB oracle — portability is part of the contract, like
  * [[Sampling.hashBucket]]'s md5 coin.
  *
  * Redaction is sequential — emails first, then IPv4, then phone — and
  * each stage's count is measured on the PREVIOUS stage's output, so the
  * reported counts are exactly the substitutions performed (a digit run
  * inside an already-redacted email is never double-counted).
  *
  * Scale shape: a pure per-row projection (three codegen'd regexes), zero
  * shuffle, pipelines with the scan at any corpus size.
  */
object Pii {

  /** RFC-5322-lite address: local part, @, dotted domain, alpha TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (unvalidated octet range — scrubbers over-match on
    * purpose; a fake "999.1.1.1" is still not text worth training on). */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** NANP-style dashed phone number. */
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  val EmailToken = "<EMAIL>"
  val Ipv4Token  = "<IP>"
  val PhoneToken = "<PHONE>"

  private def count(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Per-row PII scrub: counts per category plus the fully redacted text.
    * Output columns: every input column except `textCol`, then
    * (n_email, n_ipv4, n_phone, redacted). */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, lit(EmailPattern), lit(EmailToken))
    val t2 = regexp_replace(t1, lit(Ipv4Pattern), lit(Ipv4Token))
    val t3 = regexp_replace(t2, lit(PhonePattern), lit(PhoneToken))
    val keep = df.columns.filterNot(_ == textCol).map(col).toSeq
    df.select(keep ++ Seq(
      count(t0, EmailPattern).as("n_email"),
      count(t1, Ipv4Pattern).as("n_ipv4"),
      count(t2, PhonePattern).as("n_phone"),
      t3.as("redacted")): _*)
  }
}
