package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Instruction-tuning (SFT) data preparation: chat-template rendering
  * with loss-mask offsets, and prompt-level conversation dedup.
  *
  * The reference pipeline has no instruction surface (it is a tabular
  * credit pipeline); these operators extend the engine to the
  * fine-tuning side of a training-data platform, where the inputs are
  * multi-turn conversations rather than flat documents. The semantics
  * follow the public SFT conventions: a fixed role-tag template (the
  * shape ChatML and its descendants share), response-only loss masking
  * expressed as character offsets into the rendered text, and
  * deduplication keyed on the PROMPT (everything before the final
  * response) — two conversations that ask the same thing with different
  * answers are duplicates for training purposes (the model would see
  * conflicting targets for one input), so exactly one survives.
  */
object Instruction {

  /** One rendered turn under the fixed template: `<|role|>text<|end|>`.
    * Kept as a tiny deterministic string kernel so the whole render is
    * replayable by any engine with string concat — no tokenizer state,
    * no configuration. */
  private def renderTurn(role: Column, text: Column): Column =
    // null role/text render as empty rather than nulling the whole turn
    // (concat is null-propagating; a nulled turn would silently desync
    // n_turns from the sorted render array)
    concat(lit("<|"), coalesce(role, lit("")), lit("|>"),
      coalesce(text, lit("")), lit("<|end|>"))

  /** Render multi-turn conversations into flat training texts with
    * response-span offsets.
    *
    * Input: one row per turn — `(convCol, turnCol, roleCol, textCol)`
    * where `turnCol` is the within-conversation order key (any orderable
    * type; values need not be dense). The LAST turn of each conversation
    * is the training target (the assistant response in a well-formed SFT
    * corpus; the renderer does not inspect roles).
    *
    * Output, one row per conversation:
    *   - `conv_id`, `n_turns`
    *   - `text` — all turns rendered with the fixed template, in turn
    *     order, concatenated;
    *   - `resp_start`, `resp_len` — the final turn's rendered span as
    *     0-based character offsets into `text` (the response-only loss
    *     mask: everything before `resp_start` is context, the span
    *     itself is the target);
    *   - `prompt_fp` — md5 of `substring(text, 1, resp_start)`, the
    *     dedup key for [[dedupByPrompt]]. A single-turn conversation has
    *     an empty prompt (`resp_start = 0`, `prompt_fp = md5("")`).
    *
    * Scale shape: ONE hash aggregation keyed by conversation id — no
    * window, no second shuffle. Per-group state is the conversation's
    * rendered turns, bounded by the training context length every SFT
    * corpus enforces upstream (a conversation that cannot fit a context
    * window is truncated before it reaches packing), so the combiner
    * never holds corpus-scaled state. Duplicate `turnCol` values within
    * a conversation still render in a deterministic total order
    * (sort_array falls back to the rendered string), but the contract
    * is unique turn keys. */
  def renderChat(turns: DataFrame, convCol: String, turnCol: String,
                 roleCol: String, textCol: String): DataFrame = {
    val keyed = turns.select(
      col(convCol).as("conv_id"),
      struct(col(turnCol).as("_ord"),
        renderTurn(col(roleCol), col(textCol)).as("_r")).as("_t"))
    keyed.groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        sort_array(collect_list(col("_t"))).as("_s"))
      .withColumn("text",
        array_join(transform(col("_s"), t => t.getField("_r")), ""))
      .withColumn("_last_len",
        length(element_at(col("_s"), -1).getField("_r")).cast("long"))
      .withColumn("resp_start", (length(col("text")) - col("_last_len")).cast("long"))
      .withColumn("resp_len", col("_last_len"))
      .withColumn("prompt_fp",
        md5(col("text").substr(lit(1), col("resp_start").cast("int"))))
      .select("conv_id", "n_turns", "text", "resp_start", "resp_len", "prompt_fp")
  }

  /** Prompt-level dedup over [[renderChat]] output: for each distinct
    * `prompt_fp`, the conversation with the smallest `conv_id` survives
    * — the engine's standard deterministic keeper election (the d1/d23
    * min-id rule), so replays and re-partitions converge bit-for-bit.
    *
    * Scale shape: a skinny `(fp, min(conv))` aggregation — map-side
    * combinable, a million-copy prompt is one combiner cell — followed
    * by a left-semi join back on the composite key. No window, and the
    * payload (`text`) rides only the semi-join's probe side, never an
    * exchange of its own. */
  def dedupByPrompt(rendered: DataFrame, convCol: String = "conv_id",
                    fpCol: String = "prompt_fp"): DataFrame = {
    val keep = rendered.groupBy(col(fpCol)).agg(min(col(convCol)).as(convCol))
    rendered.join(keep, Seq(fpCol, convCol), "left_semi")
  }

  /** Preference-pair construction (DPO/RLHF data prep): for every
    * prompt with at least two candidate conversations, emit the
    * (chosen, rejected) response pair — chosen = highest `scoreCol`
    * (ties to the SMALLER conv id), rejected = lowest (ties to the
    * LARGER conv id), so an all-tied group still yields a
    * deterministic, distinct pair. Same-prompt groups are exactly what
    * [[dedupByPrompt]] collapses — this operator is the other fork of
    * that collision: instead of electing one survivor, it turns the
    * disagreement into a training signal. Input is [[renderChat]]
    * output plus a caller-supplied score column; responses are sliced
    * out of the rendered text with the loss-mask offsets. Singleton
    * prompts drop (no pair to form).
    *
    * Scale shape: ONE aggregation keyed by prompt fingerprint, the
    * chosen/rejected elections as struct-max/min — map-side
    * combinable, a million-candidate prompt is one combiner cell; no
    * window, no join-back (the response payload rides inside the
    * max/min structs). Output: (prompt_fp, n_candidates, chosen_conv,
    * rejected_conv, chosen_response, rejected_response, margin). */
  def preferencePairs(rendered: DataFrame, scoreCol: String,
                      convCol: String = "conv_id",
                      fpCol: String = "prompt_fp"): DataFrame = {
    val resp = col("text").substr(col("resp_start").cast("int") + 1,
      col("resp_len").cast("int"))
    rendered.select(col(fpCol).as("prompt_fp"), col(convCol).as("_c"),
        col(scoreCol).cast("double").as("_s"), resp.as("_resp"))
      .groupBy("prompt_fp")
      .agg(count(lit(1)).as("n_candidates"),
        max(struct(col("_s").as("s"), (-col("_c")).as("nc"),
          col("_resp").as("r"))).as("_ch"),
        min(struct(col("_s").as("s"), (-col("_c")).as("nc"),
          col("_resp").as("r"))).as("_rj"))
      .filter(col("n_candidates") >= 2)
      .select(col("prompt_fp"), col("n_candidates"),
        (-col("_ch.nc")).as("chosen_conv"),
        (-col("_rj.nc")).as("rejected_conv"),
        col("_ch.r").as("chosen_response"),
        col("_rj.r").as("rejected_response"),
        round(col("_ch.s") - col("_rj.s"), 6).as("margin"))
  }
}
