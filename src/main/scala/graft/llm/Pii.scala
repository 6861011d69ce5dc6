package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: emails, North
  * American phone numbers, and IPv4 addresses found by regex, counted per
  * document and replaced with type tokens. A pretraining pipeline runs
  * this between quality filtering and tokenization — counts feed the
  * audit report, the redacted text feeds the tokenizer.
  *
  * Everything is codegen'd `regexp_count` / `regexp_replace` column
  * algebra — narrow, no shuffle, no UDF. The patterns deliberately stay
  * within the regex subset Java and RE2 interpret identically (character
  * classes, bounded repetition; no backreferences, no lookaround), so the
  * DuckDB oracle replays them byte-for-byte.
  *
  * Redaction order is fixed email → IPv4 → phone: the email pattern can
  * consume digit runs a later pattern would also match (`bob-555@x.com`),
  * so it must claim its text first; IPv4 and phone are disjoint (dotted
  * vs dashed) but keeping one order everywhere makes the twin exact.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // \b word boundaries keep the digit patterns from matching INSIDE a
  // longer digit run ("2023.12.25.1" is a version string, not an IP;
  // "91234-567-89012" is not a phone number). \b is in the Java/RE2
  // common subset, so the DuckDB twin replays it byte-for-byte.
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val Ipv4Token = "<IP>"

  /** Per-doc PII hit counts and the redacted text. Each count runs on the
    * text as the EARLIER redactions left it (emails on raw, IPs on
    * email-redacted, phones on email+IP-redacted), so the counts equal
    * exactly the replacements present in `redacted` — counting everything
    * on raw text would double-count spans two patterns match (the IP
    * inside `bob@1.2.3.4.example.com` is consumed by the email pass and
    * never replaced as an IP). */
  def withPiiRedaction(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailRe, EmailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Re, Ipv4Token)
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Re)))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhoneRe)))
      .withColumn("redacted", regexp_replace(afterIp, PhoneRe, PhoneToken))
  }

  /** SQL twins over a text expression: count selects + the redacted
    * expression (same progressive-redaction counting order; DuckDB needs
    * the 'g' flag where Spark replaces globally by default). */
  def sqlPiiCounts(e: String): Seq[String] = {
    val afterEmail = s"regexp_replace($e, '$EmailRe', '$EmailToken', 'g')"
    val afterIp = s"regexp_replace($afterEmail, '$Ipv4Re', '$Ipv4Token', 'g')"
    Seq(
      s"CAST(len(regexp_extract_all($e, '$EmailRe')) AS INT) AS n_emails",
      s"CAST(len(regexp_extract_all($afterIp, '$PhoneRe')) AS INT) AS n_phones",
      s"CAST(len(regexp_extract_all($afterEmail, '$Ipv4Re')) AS INT) AS n_ips")
  }

  def sqlRedacted(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($e,
       | '$EmailRe', '$EmailToken', 'g'),
       | '$Ipv4Re', '$Ipv4Token', 'g'),
       | '$PhoneRe', '$PhoneToken', 'g')""".stripMargin.replaceAll("\n", "")

  // ── Credit cards (checksum-validated) ─────────────────────────────────

  /** Candidate card numbers: 4×4 dash/space groups, or 13–16 contiguous
    * digits. `\b` on both ends keeps the pattern out of longer digit
    * runs (a 17+-digit serial matches nothing — neither end can anchor
    * inside the run). Alternation order puts the grouped form first;
    * both branches stay in the Java/RE2 common subset. */
  val CcRe = "\\b(?:[0-9]{4}[- ]){3}[0-9]{4}\\b|\\b[0-9]{13,16}\\b"
  val CcToken = "<CC>"

  /** Luhn mod-10 validity of a digit-string column — pure column
    * algebra: i-th digit FROM THE RIGHT (1-based) doubles on even i,
    * folding 2x > 9 to 2x − 9, and the sum must divide by 10. The
    * checksum is what separates a card number from 16 arbitrary digits
    * — regex alone redacts order ids and ISBNs (false positives a
    * curation audit then has to explain), so candidates that fail the
    * checksum are left untouched BY DESIGN. */
  def luhnValid(d: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(d)), i => {
        val x = ascii(substring(d, (length(d) - i + 1).cast("int"),
          lit(1))) - lit(48)
        when(i % 2 === 0, when(x * 2 > 9, x * 2 - 9).otherwise(x * 2))
          .otherwise(x)
      }),
      lit(0), (acc, x) => acc + x) % 10 === 0

  /** Per-doc Luhn-validated card counts and redaction. Candidates come
    * from [[CcRe]]; only checksum-valid ones count and redact (each via
    * a literal `replace` fold, so an invalid candidate survives
    * verbatim). Composes with [[withPiiRedaction]] by running on its
    * `redacted` output (the email pass cannot eat digit runs — disjoint
    * alphabets — so order against the other passes is free). Narrow
    * codegen column algebra, no shuffle, no UDF. */
  def withCreditCardRedaction(docs: DataFrame,
                              textCol: String = "text"): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(CcRe), lit(0))
    val valid = filter(cands,
      c => luhnValid(translate(c, "- ", "")))
    docs
      .withColumn("__cc", valid)
      .withColumn("n_ccs", size(col("__cc")))
      .withColumn("redacted_cc",
        // redact at MATCHED SITES only: each candidate re-anchors in \b
        // so a valid 13-digit prefix inside a 17-digit serial (a run the
        // \b-guarded CcRe deliberately skipped) is never rewritten — a
        // literal replace(acc, c, …) here corrupted exactly that case.
        // Candidates are digits/dash/space, so the pattern needs no
        // escaping; a number appearing twice redacts at both sites via
        // the regex's global replace, and sites can never be adjacent
        // (adjacent digit runs would have merged past CcRe's \b).
        aggregate(col("__cc"), col(textCol),
          (acc, c) => regexp_replace(acc,
            concat(lit("\\b"), c, lit("\\b")), lit(CcToken))))
      .drop("__cc")
  }

  /** SQL twins: the Luhn predicate over a digit-string expression, and
    * the (n_ccs, redacted_cc) selects over a text expression. */
  def sqlLuhnValid(d: String): String =
    s"""(list_sum(list_transform(range(1, length($d) + 1), i ->
       | CASE WHEN i % 2 = 0
       |      THEN CASE WHEN (ascii(substring($d, CAST(length($d) - i + 1 AS INT), 1)) - 48) * 2 > 9
       |                THEN (ascii(substring($d, CAST(length($d) - i + 1 AS INT), 1)) - 48) * 2 - 9
       |                ELSE (ascii(substring($d, CAST(length($d) - i + 1 AS INT), 1)) - 48) * 2 END
       |      ELSE ascii(substring($d, CAST(length($d) - i + 1 AS INT), 1)) - 48
       | END)) % 10 = 0)""".stripMargin.replaceAll("\n", "")

  def sqlCcValidList(e: String): String = {
    val strip = "replace(replace(c, '-', ''), ' ', '')"
    s"list_filter(regexp_extract_all($e, '$CcRe'), " +
      s"c -> ${sqlLuhnValid(strip)})"
  }

  def sqlCcCounts(e: String): Seq[String] = Seq(
    s"CAST(len(${sqlCcValidList(e)}) AS INT) AS n_ccs",
    s"list_reduce(list_prepend($e, ${sqlCcValidList(e)}), " +
      s"(acc, c) -> regexp_replace(acc, '\\b' || c || '\\b', " +
      s"'$CcToken', 'g')) AS redacted_cc")
}
