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
}
