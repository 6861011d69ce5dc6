package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Chat

/** [[Chat]]'s parse → structure-gate → pair-extraction chain over
  * hand-built transcripts: the roles_ok gate's edge cases (missing
  * assistant tail, double roles, foreign roles, system-only), the
  * fail-closed malformed-JSON arm, and prompt dedup's keep-first
  * ordering. */
class ChatSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conv(id: Long, json: String) =
    (id, json)

  private lazy val parsed = Chat.withTurnStats(Chat.parseTurns(
    Seq(
      // well-formed: user/assistant ×2
      conv(1L,
        """[{"role":"user","content":"hello there"},
          |{"role":"assistant","content":"hi"},
          |{"role":"user","content":"more words here"},
          |{"role":"assistant","content":"sure thing friend"}]"""
          .stripMargin.replaceAll("\n", "")),
      // system prefix, then one exchange
      conv(2L,
        """[{"role":"system","content":"be brief"},
          |{"role":"user","content":"question"},
          |{"role":"assistant","content":"answer"}]"""
          .stripMargin.replaceAll("\n", "")),
      // ends on user — not ok
      conv(3L,
        """[{"role":"user","content":"a"},
          |{"role":"assistant","content":"b"},
          |{"role":"user","content":"dangling"}]"""
          .stripMargin.replaceAll("\n", "")),
      // double user — not ok
      conv(4L,
        """[{"role":"user","content":"a"},
          |{"role":"user","content":"again"},
          |{"role":"assistant","content":"b"}]"""
          .stripMargin.replaceAll("\n", "")),
      // foreign role — not ok
      conv(5L,
        """[{"role":"user","content":"a"},
          |{"role":"tool","content":"x"},
          |{"role":"assistant","content":"b"}]"""
          .stripMargin.replaceAll("\n", "")),
      // system only — no content turns, not ok
      conv(6L, """[{"role":"system","content":"alone"}]"""),
      // malformed JSON — null turns
      conv(7L, """[{"role":"user","content": BROKEN"""))
      .toDF("conv_id", "conv_json"), "conv_json"))

  test("roles_ok gate: alternation, tail, foreign roles, system-only") {
    val m = parsed.select("conv_id", "roles_ok", "has_system", "n_turns",
      "n_user", "n_assistant", "user_words", "asst_words",
      "first_role", "last_role")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getBoolean(1)); assert(!m(1L).getBoolean(2))
    assert(m(1L).getInt(3) === 4)
    assert(m(1L).getInt(4) === 2 && m(1L).getInt(5) === 2)
    assert(m(1L).getLong(6) === 5L) // "hello there" + "more words here"
    assert(m(1L).getLong(7) === 4L) // "hi" + "sure thing friend"
    assert(m(1L).getString(8) === "user" && m(1L).getString(9) === "assistant")
    assert(m(2L).getBoolean(1)); assert(m(2L).getBoolean(2))
    assert(m(2L).getString(8) === "system")
    assert(!m(3L).getBoolean(1))
    assert(!m(4L).getBoolean(1))
    assert(!m(5L).getBoolean(1))
    assert(!m(6L).getBoolean(1))
  }

  test("malformed JSON fails closed: null turns, excluded from pairs") {
    assert(parsed.filter(col("conv_id") === 7L && col("turns").isNull)
      .count() === 1L)
    assert(Chat.sftPairs(parsed, "conv_id")
      .filter(col("conv_id") === 7L).count() === 0L)
  }

  test("sftPairs: one row per assistant turn, prompt covers prefix") {
    val p = Chat.sftPairs(parsed, "conv_id")
      .orderBy("conv_id", "turn_idx").collect()
    // conv 1 → asst turns at idx 1,3; conv 2 → idx 2
    assert(p.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 1), (1L, 3), (2L, 2)))
    // prompt of conv1/idx1 is just the first user turn
    val h1 = p(0).getAs[String]("prompt_hash")
    val exp1 = java.security.MessageDigest.getInstance("MD5")
      .digest("user: hello there".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h1 === exp1)
    // prompt of conv2/idx2 includes the system turn
    val exp2 = java.security.MessageDigest.getInstance("MD5")
      .digest("system: be brief\nuser: question".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(p(2).getAs[String]("prompt_hash") === exp2)
  }

  test("dedupByPrompt keeps the first pair in (conv, turn) order") {
    val dup = Chat.withTurnStats(Chat.parseTurns(Seq(
      conv(10L, """[{"role":"user","content":"same"},{"role":"assistant","content":"r1"}]"""),
      conv(11L, """[{"role":"user","content":"same"},{"role":"assistant","content":"r2"}]"""),
      conv(12L, """[{"role":"user","content":"other"},{"role":"assistant","content":"r3"}]"""))
      .toDF("conv_id", "conv_json"), "conv_json"))
    val out = Chat.dedupByPrompt(Chat.sftPairs(dup, "conv_id"), "conv_id")
      .orderBy("conv_id").collect()
    assert(out.map(_.getAs[Boolean]("kept")).toSeq ===
      Seq(true, false, true))
  }

  test("preferencePairs: longest response wins, ties break by conv") {
    val dup = Chat.withTurnStats(Chat.parseTurns(Seq(
      conv(20L, """[{"role":"user","content":"same"},{"role":"assistant","content":"one word"}]"""),
      conv(21L, """[{"role":"user","content":"same"},{"role":"assistant","content":"three whole words"}]"""),
      conv(22L, """[{"role":"user","content":"same"},{"role":"assistant","content":"two words"}]"""),
      conv(23L, """[{"role":"user","content":"lonely"},{"role":"assistant","content":"no pair"}]"""))
      .toDF("conv_id", "conv_json"), "conv_json"))
    val out = Chat.preferencePairs(Chat.sftPairs(dup, "conv_id"), "conv_id")
      .collect()
    assert(out.length === 1) // the lonely prompt has no pair
    val r = out.head
    assert(r.getAs[Long]("n_candidates") === 3L)
    assert(r.getAs[Long]("chosen_conv") === 21L)
    assert(r.getAs[Long]("chosen_words") === 3L)
    // words tie (2) between conv 20 and 22 → conv DESC elects 22
    assert(r.getAs[Long]("rejected_conv") === 22L)
    assert(r.getAs[Long]("rejected_words") === 2L)
    assert(r.getAs[Long]("margin") === 1L)
  }

  test("preferencePairs tie on words: chosen lowest conv, rejected highest") {
    val dup = Chat.withTurnStats(Chat.parseTurns(Seq(
      conv(30L, """[{"role":"user","content":"same"},{"role":"assistant","content":"aa bb"}]"""),
      conv(31L, """[{"role":"user","content":"same"},{"role":"assistant","content":"cc dd"}]"""))
      .toDF("conv_id", "conv_json"), "conv_json"))
    val r = Chat.preferencePairs(Chat.sftPairs(dup, "conv_id"), "conv_id")
      .collect().head
    assert(r.getAs[Long]("chosen_conv") === 30L)
    assert(r.getAs[Long]("rejected_conv") === 31L)
    assert(r.getAs[Long]("margin") === 0L)
  }

  test("incremental prompt dedup reproduces the global keep-first") {
    val convs = Chat.withTurnStats(Chat.parseTurns((10L to 19L).map(i =>
      conv(i, s"""[{"role":"user","content":"tmpl ${i % 3}"},{"role":"assistant","content":"r$i words"}]"""))
      .toDF("conv_id", "conv_json"), "conv_json"))
    val pairs = Chat.sftPairs(convs, "conv_id")
    val global = Chat.dedupByPrompt(pairs, "conv_id")
      .select("conv_id", "turn_idx", "kept")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2))
      .toMap
    val b1 = Chat.dedupByPrompt(pairs.filter(col("conv_id") <= 14), "conv_id")
    val b2 = Chat.dedupByPromptIncremental(
      pairs.filter(col("conv_id") > 14), Chat.promptSet(b1), "conv_id")
    val folded = b1.unionByName(b2)
      .select("conv_id", "turn_idx", "kept")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2))
      .toMap
    assert(folded === global)
    // the fold did real work: batch 2 repeats batch-1 templates
    assert(b2.filter(!col("kept")).count() > 0)
  }

  test("working-name clash guard") {
    val bad = parsed.withColumn("__pair", lit(1))
    val e = intercept[IllegalArgumentException](
      Chat.sftPairs(bad, "conv_id"))
    assert(e.getMessage.contains("__pair"))
  }
}
