package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InstructionSpec extends SparkSpec {
  import spark.implicits._

  // two conversations: conv 1 is user/assistant/user/assistant (4 turns,
  // non-dense turn keys), conv 2 is a single assistant turn (empty prompt)
  private def turns = Seq(
    (1L, 10L, "user", "hello"),
    (1L, 20L, "assistant", "hi there"),
    (1L, 35L, "user", "what is 2+2?"),
    (1L, 40L, "assistant", "4"),
    (2L, 5L, "assistant", "unprompted")
  ).toDF("conv_id", "turn", "role", "txt")

  test("renderChat: template, order, and offsets slice the response exactly") {
    val r = Instruction.renderChat(turns, "conv_id", "turn", "role", "txt")
      .collect().map(x => x.getAs[Long]("conv_id") -> x).toMap
    val c1 = r(1L)
    assert(c1.getAs[Long]("n_turns") == 4L)
    val text = c1.getAs[String]("text")
    assert(text ==
      "<|user|>hello<|end|><|assistant|>hi there<|end|>" +
      "<|user|>what is 2+2?<|end|><|assistant|>4<|end|>")
    val start = c1.getAs[Long]("resp_start").toInt
    val len = c1.getAs[Long]("resp_len").toInt
    // the offsets ARE the loss mask: the slice is the final rendered turn
    assert(text.substring(start, start + len) == "<|assistant|>4<|end|>")
    assert(start + len == text.length)
  }

  test("renderChat: single-turn conversation has an empty prompt") {
    val r = Instruction.renderChat(turns, "conv_id", "turn", "role", "txt")
      .filter($"conv_id" === 2L).head()
    assert(r.getAs[Long]("resp_start") == 0L)
    // md5("") — the canonical empty-prompt fingerprint
    assert(r.getAs[String]("prompt_fp") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("renderChat: partition-count invariant (order comes from the sort, not arrival)") {
    val a = Instruction.renderChat(turns.repartition(7), "conv_id", "turn", "role", "txt")
      .orderBy("conv_id").collect().toSeq
    val b = Instruction.renderChat(turns.coalesce(1), "conv_id", "turn", "role", "txt")
      .orderBy("conv_id").collect().toSeq
    assert(a == b)
  }

  test("dedupByPrompt: same-prompt different-response twin drops, min conv survives") {
    // twin conv 99 repeats conv 1's prompt turns with a different answer
    val twin = Seq(
      (99L, 10L, "user", "hello"),
      (99L, 20L, "assistant", "hi there"),
      (99L, 35L, "user", "what is 2+2?"),
      (99L, 40L, "assistant", "five, obviously")
    ).toDF("conv_id", "turn", "role", "txt")
    val rendered = Instruction.renderChat(turns.unionByName(twin),
      "conv_id", "turn", "role", "txt")
    val fps = rendered.filter($"conv_id".isin(1L, 99L))
      .select("prompt_fp").distinct().count()
    assert(fps == 1L, "twin must share conv 1's prompt fingerprint")
    val kept = Instruction.dedupByPrompt(rendered)
      .select("conv_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"min-conv keeper: $kept")
  }

  test("dedupByPrompt: distinct prompts all survive") {
    val rendered = Instruction.renderChat(turns, "conv_id", "turn", "role", "txt")
    assert(Instruction.dedupByPrompt(rendered).count() == 2L)
  }

  test("preferencePairs: score elects chosen/rejected, ties split deterministically, " +
       "singletons drop") {
    val twin = Seq(
      (99L, 10L, "user", "hello"),
      (99L, 20L, "assistant", "hi there"),
      (99L, 35L, "user", "what is 2+2?"),
      (99L, 40L, "assistant", "five, obviously")
    ).toDF("conv_id", "turn", "role", "txt")
    val rendered = Instruction.renderChat(turns.unionByName(twin),
      "conv_id", "turn", "role", "txt")
    val pairs = Instruction.preferencePairs(rendered, scoreCol = "resp_len")
      .collect()
    // conv 2 is a singleton prompt — no pair
    assert(pairs.length == 1)
    val p = pairs.head
    // longer response ("five, obviously") wins over "4"
    assert(p.getAs[Long]("chosen_conv") == 99L)
    assert(p.getAs[Long]("rejected_conv") == 1L)
    assert(p.getAs[String]("chosen_response") == "<|assistant|>five, obviously<|end|>")
    assert(p.getAs[String]("rejected_response") == "<|assistant|>4<|end|>")
    assert(p.getAs[Double]("margin") ==
      "<|assistant|>five, obviously<|end|>".length - "<|assistant|>4<|end|>".length)
    // all-tied scores: chosen = smaller conv, rejected = larger — a
    // deterministic, DISTINCT pair even with no signal
    val tied = Instruction.preferencePairs(
      rendered.withColumn("const", lit(1.0)), scoreCol = "const").collect()
    val t = tied.head
    assert(t.getAs[Long]("chosen_conv") == 1L &&
      t.getAs[Long]("rejected_conv") == 99L)
    assert(t.getAs[Double]("margin") == 0.0)
  }
}
