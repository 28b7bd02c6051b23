package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{SlotParser, TextKernels}

/** Fuzz invariants: random junk through the delicate parsers must never
  * throw, and outputs must stay inside their contracts. One batched
  * DataFrame pass per invariant (see KernelPropertiesSpec). */
class FuzzSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(7L)).get

  private val slotJunk: Gen[String] = Gen.oneOf(
    // plausible slot shapes
    for {
      h1 <- Gen.choose(0, 30); h2 <- Gen.choose(0, 30)
      sep <- Gen.oneOf("-", "–", " - ", " to ")
      sfx <- Gen.oneOf("", "am", "pm", " AM", " PM", " min", ":15", ":30pm")
    } yield s"$h1$sep$h2$sfx",
    // arbitrary printable junk
    Gen.asciiPrintableStr,
    // pathological
    Gen.oneOf("", "   ", ":::", "ampm", "99:99-99:99", "morning evening",
      "12:345 - 6", "- - -", "25pm-3am"))

  test("SlotParser: 400 random inputs never throw; outputs obey contracts") {
    val cases = sample(slotJunk, 400)
    val df = cases.toDF("dt")
      .select(SlotParser.normalizeSlotText(col("dt")).as("slot_txt"))
    val parsed = df.select(col("slot_txt") +: SlotParser.parse(col("slot_txt")): _*)
      .collect() // must not throw
    parsed.foreach { r =>
      // delivery_slot is null or HH:MM-HH:MM shaped (hours may exceed 23
      // by reference contract, but always 2+ digits and colons in place)
      if (!r.isNullAt(1))
        assert(r.getString(1).matches("\\d{2,}:\\d{2,}-\\d{2,}:\\d{2,}"),
          s"bad slot ${r.getString(1)} from '${r.getString(0)}'")
      // start/end times, when present, are valid 24h HH:MM:SS
      Seq(2, 3).foreach { i =>
        if (!r.isNullAt(i))
          assert(r.getString(i).matches("([01]\\d|2[0-3]|\\d):\\d{2,}:00"),
            s"bad time ${r.getString(i)} from '${r.getString(0)}'")
      }
      assert(Set("morning", "afternoon", "evening", "other")(r.getString(4)))
    }
  }

  test("quality score stays in [0,1] for arbitrary token mixes") {
    val texts = sample(Gen.nonEmptyListOf(
      Gen.oneOf("the", "a", "x", "spark", "row", "zz", "q")).map(_.mkString(" ")), 300)
    val ws = TextKernels.tokens(col("text"))
    val got = texts.toDF("text").select(
      TextKernels.qualityScore(
        TextKernels.tokenCount(ws),
        TextKernels.distinctRatio(ws),
        TextKernels.stopwordRatio(ws, Seq("the", "a"))).as("q")).collect()
    got.foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
  }
}
