package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure column-level codecs, the Spark re-expression of the reference's
  * per-document scalar plumbing (see /root/reference/monstache.go and
  * monstachemap/encoding.go; cited per function).
  *
  * Everything here stays inside Catalyst built-ins so it participates in
  * whole-stage codegen — no UDFs on the hot path.
  */
object Codecs {

  /** Operation → version offset. Insert 0, update 1, delete 2 — the
    * "delete wins ties by +2" trick that makes unordered replay converge
    * (monstache.go:4053-4063 `tsVersion`). Any other op (drops, no-ops)
    * gets +0, exactly the reference's switch fall-through. */
  def opOffset(op: Column): Column =
    when(op === "u", 1L).when(op === "d", 2L).otherwise(0L)

  /** External version from a MongoDB cluster time `{T: seconds, I: counter}`:
    * `(T << 32 | I) + offset` (monstache.go:4053-4063). Last-writer-wins on
    * this column replaces sink-side external versioning. */
  def tsVersion(tsT: Column, tsI: Column, op: Column): Column =
    (shiftleft(tsT.cast("long"), 32) + tsI.cast("long")) + opOffset(op)

  /** Canonical `_id` string for a numeric id: whole doubles collapse to
    * integer form ("10.0" → "10", monstache.go:822-835 `opIDToString`). */
  def numericIdToString(c: Column): Column = {
    val s = c.cast("string")
    val d = c.cast("double")
    // exact integral forms (long ids, integral strings) pass VERBATIM:
    // the reference collapses only float64/float32-TYPED ids and formats
    // int64/string ids exactly (opIDToString monstache.go:818-838) — a
    // double round-trip here would corrupt ids beyond 2^53 into a
    // DIFFERENT document id. The collapse therefore applies only to
    // values whose string form carries a fraction mark (which is how
    // every double-typed column stringifies: "10.0", "1.0E8") — an
    // exotic-but-valid STRING id like "1e5" has no fraction mark and
    // passes verbatim, exactly the reference's default branch. The
    // long-cast is additionally bounded to the doubles that represent
    // integers exactly (|d| < 2^53): beyond that the reference's %v
    // prints the float form anyway, and ANSI mode would turn an
    // overflowing cast into a job-killing error.
    when(s.rlike("^[+-]?\\d+\\.\\d+(E[+-]?\\d+)?$") &&
        d === floor(d) && !isnan(d) &&
        abs(d) < lit(9007199254740992.0d),
      d.cast("long").cast("string"))
      .otherwise(s)
  }

  /** Sink id guards: empty ids and ids over 512 bytes are rejected
    * (monstache.go:3167-3171). */
  def idAccepted(id: Column): Column =
    id.isNotNull && length(id) > 0 && octet_length(id) <= 512

  /** NaN/±Inf → null (opt-in `prune-invalid-json`, monstache.go:878-950). */
  def pruneInvalidDouble(c: Column): Column = {
    val d = c.cast("double")
    when(isnan(d) || abs(d) === lit(Double.PositiveInfinity), lit(null).cast("double"))
      .otherwise(d)
  }

  /** Dates outside year [0, 9999] are pruned (monstache.go:887-895). */
  def pruneInvalidDate(c: Column): Column =
    when(year(c).between(0, 9999), c) // no otherwise → null of c's type

  /** Translate a Go reference-time layout (e.g. "2006/01/02 15:04:05",
    * monstache.go:2882-2890) into a JVM DateTimeFormatter pattern.
    * Longest-token-first so "01" does not eat the "1" in "15". */
  private val goTokens: Seq[(String, String)] = Seq(
    "2006" -> "yyyy",
    "01" -> "MM", "02" -> "dd", "15" -> "HH", "04" -> "mm", "05" -> "ss",
    "Jan" -> "MMM", "Mon" -> "EEE",
    ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
    // Go "-07:00" ALWAYS emits a numeric offset ("+00:00" at UTC) → JVM
    // "xxx"; only "Z07:00" emits a literal Z at UTC → JVM "XXX"
    "-07:00" -> "xxx", "Z07:00" -> "XXX", "-0700" -> "Z", "MST" -> "zzz"
  ).sortBy(-_._1.length)
  /** Go reference-time tokens OUTSIDE the supported subset. They must be
    * a loud error, not literals: Go substitutes them ("January" renders
    * the month, "06" the two-digit year), so passing them through
    * verbatim silently mistranslates every index name — the same
    * loud-or-nothing stance as [[goDurationToMillis]]. Checked
    * per-position BEFORE the supported match ("Jan" would otherwise eat
    * "January"'s prefix). */
  private val goUnsupportedPrefixes =
    Seq("January", "Monday", "PM", "pm")

  def goLayoutToJvm(layout: String): String = {
    val sb = new StringBuilder
    val run = new StringBuilder // pending literal-letter run
    // letters must be quoted as ONE run: per-letter quoting ('m''o') is
    // read by DateTimeFormatter as an escaped literal quote between the
    // letters ('' = '), corrupting any layout with adjacent literal
    // letters (e.g. the stats-index-format prefix "monstache.stats.")
    def flush(): Unit = if (run.nonEmpty) {
      sb.append('\'').append(run.toString.replace("'", "''")).append('\'')
      run.clear()
    }
    def unsupported(i: Int): Nothing = throw new IllegalArgumentException(
      s"unsupported Go layout token at position $i in '$layout' — " +
        "supported tokens: 2006 01 02 15 04 05 Jan Mon " +
        ".000/.000000/.000000000 -07:00 -0700 Z07:00 MST")
    var i = 0
    while (i < layout.length) {
      if (goUnsupportedPrefixes.exists(layout.startsWith(_, i)))
        unsupported(i)
      goTokens.find { case (go, _) => layout.startsWith(go, i) } match {
        case Some((go, jvm)) => flush(); sb.append(jvm); i += go.length
        case None =>
          val c = layout.charAt(i)
          // digit sequences Go actually TOKENIZES (format.go nextStdChunk)
          // but this subset does not support: "002" day-of-year, "06"
          // two-digit year, "03" zero-padded 12h hour, and lone 1-5
          // (month/day/hour/minute/second). Those must be loud — Go
          // substitutes them, so passing them through would stamp wrong
          // names. Digits Go treats as LITERALS ('0' not followed by 1-6,
          // and 6-9) pass through verbatim, exactly like the reference
          // ("...v7.2006-01-02" is a valid layout with a literal 7).
          if (c.isDigit) {
            if (layout.startsWith("002", i) || layout.startsWith("06", i) ||
              layout.startsWith("03", i) || (c >= '1' && c <= '5'))
              unsupported(i)
          }
          if (c == '_' && i + 1 < layout.length &&
            layout.charAt(i + 1) == '2') unsupported(i)
          // fractional seconds, by Go's own rule (format.go nextStdChunk):
          // '.'/',' + a run of all-0s or all-9s is a fraction token ONLY
          // when the run ends at a non-digit — ".01" is a literal dot
          // followed by the month token, NOT a fraction
          if ((c == '.' || c == ',') && i + 1 < layout.length &&
            (layout.charAt(i + 1) == '0' || layout.charAt(i + 1) == '9')) {
            val ch = layout.charAt(i + 1)
            var j = i + 1
            while (j < layout.length && layout.charAt(j) == ch) j += 1
            if (j >= layout.length || !layout.charAt(j).isDigit)
              unsupported(i)
          }
          if (c.isLetter || c == '\'') run.append(c) else { flush(); sb.append(c) }
          i += 1
      }
    }
    flush()
    sb.toString
  }

  /** The reference's default oplog-date format "2006/01/02 15:04:05"
    * (monstache.go:2882-2890) as a JVM pattern. */
  val DefaultOplogDateFormat: String = goLayoutToJvm("2006/01/02 15:04:05")

  private val goDurationUnit = "([0-9]*\\.?[0-9]+)(ms|s|m|h)".r

  /** Parse a Go duration literal ("30s", "1.5h", "2h45m", "300ms") to
    * milliseconds — the subset of Go's ParseDuration the reference's
    * duration-typed config keys use (`stats-duration` monstache.go:355,
    * parsed at 2860-2868). Unsupported text is a loud error, never a
    * silently-zero cadence. */
  def goDurationToMillis(s: String): Long = {
    val t = s.trim
    val ms = goDurationUnit.findAllMatchIn(t).toSeq
    require(ms.nonEmpty && ms.map(_.matched).mkString == t,
      s"unsupported Go duration: '$s'")
    val total = ms.map { m =>
      val unit = m.group(2) match {
        case "ms" => 1L
        case "s" => 1000L
        case "m" => 60000L
        case "h" => 3600000L
      }
      // per-component truncation ("1s0.5ms" → 1000 + 0) is fine — Go
      // itself has no sub-ns precision and we have no sub-ms — EXCEPT
      // when truncation zeroes the whole cadence (below)
      (m.group(1).toDouble * unit).toLong
    }.sum
    // "0.5ms" would truncate to a zero cadence — exactly the silent
    // flush-nothing failure this parser promises never to produce
    require(total > 0 || ms.forall(_.group(1).toDouble == 0),
      s"Go duration '$s' is sub-millisecond — it would truncate to a zero cadence")
    total
  }

  // ── P6/P8: BSON identity + value codecs ───────────────────────────────

  /** ObjectID (12-byte binary) → 24-char lowercase hex id
    * (monstache.go:818-819 `opIDToString`). */
  def objectIdHex(bin: Column): Column = lower(hex(bin))

  /** Binary subtype 0x03/0x04 → dashed lowercase UUID string when the
    * payload is the expected 16 bytes; any other length falls back to
    * plain hex, exactly the reference's guard (monstachemap/encoding.go:
    * 58-76 formats only len==16, default branch emits unformatted). */
  def binaryToUuid(bin: Column): Column = {
    val h = lower(hex(bin))
    when(length(h) === 32,
      concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
        substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12)))
      .otherwise(h)
  }

  /** Binary (other subtypes) → plain RFC-4648 base64 (encoding.go:77-80).
    * Spark's `base64` emits MIME CRLF chunks every 76 chars when
    * `spark.sql.chunkBase64String.enabled` is set; the reference never
    * chunks, so strip any line breaks unconditionally. */
  def binaryToBase64(bin: Column): Column =
    regexp_replace(base64(bin), "[\\r\\n]", "")

  /** Decimal128 → JSON value: the raw literal at the source value's own
    * scale (encoding.go:47-56 emits `primitive.Decimal128.String()`
    * verbatim — up to 34 significant digits, no re-scaling); only NaN/±Inf
    * are intercepted → null. A fixed-scale recast here would round >6-dp
    * values and pad trailing zeros the reference does not emit. */
  def decimal128Json(c: Column): Column = {
    val s = c.cast("string")
    // NaN/±Inf are detected on the STRING form: Decimal128 exponents
    // reach ±6144 while doubles stop near 1.8E308, so a double-cast
    // detour would read a legitimate huge literal as Infinity and null
    // a finite value the reference emits verbatim
    when(upper(s).isin("NAN", "INFINITY", "-INFINITY", "+INFINITY"),
      lit(null).cast("string"))
      .otherwise(s)
  }

  /** BSON DateTime → ISO-8601 with millis, UTC ("Z"); dates outside year
    * [0, 9999] are invalid JSON dates → null (encoding.go:13,27-36; prune
    * monstache.go:887-895). */
  def bsonDateString(ts: Column): Column =
    when(year(ts).between(0, 9999),
      concat(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS"), lit("Z")))

  /** Default index name: lowercased namespace (monstache.go:795-800). */
  def defaultIndexName(namespace: Column): Column = lower(namespace)
}
