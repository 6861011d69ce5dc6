package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation (SFT / chat) dataset operators — the
  * instruction-tuning half of a training-data pipeline: parse
  * serialized conversations, validate their role structure, and
  * explode them into deduplicated prompt→response training pairs.
  *
  * The reference's analog is the P1/P2 document-mapper surface
  * (reference: monstache.go:1520-1609 maps raw documents to indexed
  * shapes); here the "document" is a chat transcript and the mapped
  * shape is the (prompt, response) example an SFT loader consumes.
  *
  * Scale shape: everything is per-conversation narrow work — the JSON
  * parse, the role scan, and the pair explosion ride the scan with no
  * shuffle (turn arrays are bounded: context windows cap real
  * transcripts at tens of turns, so the carried array is O(1) per
  * row). The only exchange in the family is [[dedupByPrompt]]'s
  * hash-partition on `prompt_hash` — exact dedup on a 128-bit key,
  * the q30 discipline applied to prompts. */
object Chat {

  /** `[{"role": "...", "content": "..."}, ...]` — the de-facto
    * interchange schema (OpenAI-style message lists, ShareGPT dumps). */
  val TurnSchema: ArrayType =
    ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType))))

  /** Parse a serialized conversation column into a `turns` array.
    * Malformed JSON yields null turns (from_json's contract) — callers
    * gate on `turns IS NOT NULL`, fail-closed. */
  def parseTurns(df: DataFrame, jsonCol: String,
                 out: String = "turns"): DataFrame =
    df.withColumn(out, from_json(col(jsonCol), TurnSchema))

  /** Per-conversation structural stats over a parsed `turns` array:
    * counts per role, word masses, and `roles_ok` — the gate an SFT
    * pipeline applies before pair extraction: an optional single
    * leading `system` turn, then strict user/assistant alternation
    * starting with `user` and ending with `assistant`. One narrow
    * projection; the turn scan is a bounded higher-order fold, no
    * UDF. */
  def withTurnStats(df: DataFrame, turnsCol: String = "turns"): DataFrame = {
    val t = col(turnsCol)
    val hasSystem = t.getItem(0).getField("role") === "system"
    // content turns: the conversation after the optional system prefix
    val ct = when(hasSystem, expr(s"slice($turnsCol, 2, size($turnsCol) - 1)"))
      .otherwise(t)
    df.withColumn("__ct", ct)
      .withColumn("has_system", coalesce(hasSystem, lit(false)))
      .withColumn("n_turns", size(t))
      .withColumn("n_user",
        size(filter(col("__ct"), x => x.getField("role") === "user")))
      .withColumn("n_assistant",
        size(filter(col("__ct"), x => x.getField("role") === "assistant")))
      .withColumn("roles_ok",
        size(col("__ct")) > 0 &&
          !exists(col("__ct"),
            x => x.getField("role") =!= "user" &&
              x.getField("role") =!= "assistant") &&
          forall(expr("sequence(0, size(__ct) - 1)"),
            i => col("__ct").getItem(i).getField("role") ===
              when(i % 2 === 0, "user").otherwise("assistant")) &&
          element_at(col("__ct"), -1).getField("role") === "assistant")
      .withColumn("user_words", coalesce(aggregate(
        filter(col("__ct"), x => x.getField("role") === "user"),
        lit(0L),
        (acc, x) => acc + size(TextHash.words(x.getField("content")))),
        lit(0L)))
      .withColumn("asst_words", coalesce(aggregate(
        filter(col("__ct"), x => x.getField("role") === "assistant"),
        lit(0L),
        (acc, x) => acc + size(TextHash.words(x.getField("content")))),
        lit(0L)))
      .withColumn("first_role", t.getItem(0).getField("role"))
      .withColumn("last_role", element_at(t, -1).getField("role"))
      .drop("__ct")
  }

  /** Explode `roles_ok` conversations into one row per assistant turn:
    * `turn_idx` (0-based position in the FULL turns array), `prompt`
    * (every prior turn rendered `role: content`, newline-joined — the
    * string an SFT collator would feed as context), and the response.
    * Narrow per-conversation work; prompts carry only the bounded
    * turn prefix. */
  def sftPairs(df: DataFrame, convIdCol: String,
               turnsCol: String = "turns"): DataFrame = {
    val working = Seq("__pair")
    val clash = df.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with sftPairs working names — rename them")
    // render ALL of a conversation's pairs in ONE per-row expression —
    // the exploded rows carry only the bounded (idx, prompt, response)
    // structs, never the turns array, and the higher-order rendering
    // runs once per conversation instead of once per pair (the
    // interpreted-HOF tax measured 3-4× on the pair-grain version)
    val pairsArr = expr(
      s"""filter(transform(sequence(1, size($turnsCol) - 1), i ->
         |  CASE WHEN $turnsCol[i].role = 'assistant' THEN named_struct(
         |    'idx', i,
         |    'prompt', array_join(transform(slice($turnsCol, 1, i),
         |      x -> concat(x.role, ': ', x.content)), chr(10)),
         |    'response', $turnsCol[i].content) END),
         |  p -> p IS NOT NULL)""".stripMargin.replaceAll("\n", " "))
    df.filter(col("roles_ok"))
      .select(col(convIdCol), explode(pairsArr).as("__pair"))
      .select(col(convIdCol),
        col("__pair.idx").as("turn_idx"),
        md5(col("__pair.prompt")).as("prompt_hash"),
        md5(col("__pair.response")).as("response_hash"),
        size(TextHash.words(col("__pair.response"))).cast("long")
          .as("response_words"))
  }

  /** Preference-pair (DPO/RLHF-style) set construction over extracted
    * SFT pairs: for every prompt with ≥2 candidate responses, elect
    * `chosen` = the response ranked first by (response_words DESC,
    * convId ASC, turn_idx ASC) and `rejected` = first by
    * (response_words ASC, convId DESC, turn_idx DESC) — a
    * deterministic longest-response baseline (swap the rank columns
    * for a model-scored elector; the plan shape is identical).
    * `margin` is the word gap the trainer's loss weights by.
    *
    * Scale shape: both row_numbers share one hash partition on
    * `prompt_hash` (same key → one exchange, two local sorts), and
    * the self-join of the two rank-1 slices joins on that same key,
    * so AQE reuses the exchange; no row ever carries more than one
    * candidate's metadata. */
  def preferencePairs(pairs: DataFrame, convIdCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPrompt = Window.partitionBy(col("prompt_hash"))
    val wChosen = byPrompt.orderBy(col("response_words").desc,
      col(convIdCol), col("turn_idx"))
    val wRejected = byPrompt.orderBy(col("response_words"),
      col(convIdCol).desc, col("turn_idx").desc)
    val ranked = pairs
      .withColumn("__n", count(lit(1)).over(byPrompt))
      .filter(col("__n") >= 2)
      .withColumn("__rc", row_number().over(wChosen))
      .withColumn("__rr", row_number().over(wRejected))
    val chosen = ranked.filter(col("__rc") === 1).select(
      col("prompt_hash"), col("__n").as("n_candidates"),
      col(convIdCol).as("chosen_conv"), col("turn_idx").as("chosen_turn"),
      col("response_words").as("chosen_words"))
    val rejected = ranked.filter(col("__rr") === 1).select(
      col("prompt_hash"), col(convIdCol).as("rejected_conv"),
      col("turn_idx").as("rejected_turn"),
      col("response_words").as("rejected_words"))
    chosen.join(rejected, Seq("prompt_hash"))
      .withColumn("margin", col("chosen_words") - col("rejected_words"))
  }

  /** Exact prompt dedup: keep the first pair per `prompt_hash` in
    * (convId, turn_idx) order — templated instructions are the
    * classic SFT duplicate source, and training on N copies of one
    * prompt skews the loss. One hash-partition exchange on the
    * 128-bit key; ordering inside a partition is a local sort. */
  def dedupByPrompt(pairs: DataFrame, convIdCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prompt_hash"))
      .orderBy(col(convIdCol), col("turn_idx"))
    pairs.withColumn("kept", row_number().over(w) === 1)
  }

  /** The dedup's persisted artifact: the distinct prompt keys a batch
    * has seen — prompt-class-sized, ADDITIVE across batches
    * (union-distinct), the repo's census-artifact convention. */
  def promptSet(pairs: DataFrame): DataFrame =
    pairs.select(col("prompt_hash")).distinct()

  /** Incremental [[dedupByPrompt]]: dedup a NEW batch against the
    * persisted prompt set — kept iff first within the batch AND the
    * prompt is unseen. When batches arrive in convId order (the
    * daily-ingest contract every incremental operator here states),
    * the fold reproduces the full-corpus keep-first EXACTLY (q241's
    * proof). One window exchange on prompt_hash; the seen-set join is
    * key-sized and broadcast below the threshold. */
  def dedupByPromptIncremental(batch: DataFrame, seen: DataFrame,
                               convIdCol: String): DataFrame = {
    val working = Seq("__seen")
    val clash = batch.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with dedupByPromptIncremental working names — rename them")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prompt_hash"))
      .orderBy(col(convIdCol), col("turn_idx"))
    batch
      .join(seen.select(col("prompt_hash")).distinct()
        .withColumn("__seen", lit(true)), Seq("prompt_hash"), "left")
      .withColumn("kept",
        row_number().over(w) === 1 && col("__seen").isNull)
      .drop("__seen")
  }
}
