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
    concat(lit("<|"), role, lit("|>"), text, lit("<|end|>"))

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
}
