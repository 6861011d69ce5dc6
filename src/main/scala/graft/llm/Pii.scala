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
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val Ipv4Token = "<IP>"

  /** Per-doc PII hit counts (on the raw text) and the redacted text. */
  def withPiiRedaction(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(col(textCol), lit(Ipv4Re)))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailRe, EmailToken),
            Ipv4Re, Ipv4Token),
          PhoneRe, PhoneToken))

  /** SQL twins over a text expression: count selects + the redacted
    * expression (same pattern order; DuckDB needs the 'g' flag where
    * Spark replaces globally by default). */
  def sqlPiiCounts(e: String): Seq[String] = Seq(
    s"CAST(len(regexp_extract_all($e, '$EmailRe')) AS INT) AS n_emails",
    s"CAST(len(regexp_extract_all($e, '$PhoneRe')) AS INT) AS n_phones",
    s"CAST(len(regexp_extract_all($e, '$Ipv4Re')) AS INT) AS n_ips")

  def sqlRedacted(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($e,
       | '$EmailRe', '$EmailToken', 'g'),
       | '$Ipv4Re', '$Ipv4Token', 'g'),
       | '$PhoneRe', '$PhoneToken', 'g')""".stripMargin.replaceAll("\n", "")
}
