package graft

import org.apache.spark.sql.functions._
import graft.functions.SlotParser

/** Branch coverage for the delivery-slot parser kernel against expected
  * values hand-derived from the reference model's semantics
  * (stg_delivery_slots.sql:23-119), including its quirks. */
class SlotParserSpec extends SparkSpec {
  import spark.implicits._

  private def parseOne(raw: String) = {
    val df = Seq(raw).toDF("dt")
      .select(SlotParser.normalizeSlotText(col("dt")).as("slot_txt"))
    df.select(col("slot_txt") +: SlotParser.parse(col("slot_txt")): _*).head
  }

  test("am window: 8am - 10am → 08:00-10:00 morning") {
    val r = parseOne("8am - 10am")
    assert(r.getString(1) === "08:00-10:00")
    assert(r.getString(2) === "08:00:00" && r.getString(3) === "10:00:00")
    assert(r.getString(4) === "morning" && !r.getBoolean(5))
  }

  test("pm with minutes keeps the reference's second-token quirk") {
    // '10:30 - 12:30 pm': 2nd numeric token is '30' (not 12!); 30 ≥ 12 so
    // pm adds nothing → end hour '30', which fails the 0-23 validity
    // regex → end_time null (faithful to the reference)
    val r = parseOne("10:30 - 12:30 PM")
    assert(r.getString(1) === "22:30-30:30")
    assert(r.getString(2) === "22:30:00")
    assert(r.isNullAt(3))
    assert(r.getString(4) === "other")
  }

  test("en/em dash + multi-space normalization, pm hint: 2  PM – 4  PM") {
    val r = parseOne("2  PM – 4  PM")
    assert(r.getString(0) === "2 pm - 4 pm")
    assert(r.getString(1) === "14:00-16:00" && r.getString(4) === "afternoon")
  }

  test("morning word implies am but no canonical slot without am/pm/colon") {
    val r = parseOne("Morning 9 - 11")
    // canonical slot requires am/pm text or a colon — 'morning' alone
    // yields null delivery_slot but still a valid start_time + period
    assert(r.isNullAt(1))
    assert(r.getString(2) === "09:00:00" && r.getString(4) === "morning")
  }

  test("12pm stays 12, 12am becomes 0") {
    assert(parseOne("12pm - 2pm").getString(1) === "12:00-14:00")
    val r = parseOne("12am - 1:15am")
    // only ONE ':MM' group exists (the end token's ':15') — it becomes the
    // START minutes (first occurrence) and the end falls back to '00'
    assert(r.getString(1) === "00:15-01:00")
    assert(r.getString(4) === "other")
  }

  test("duration strings are flagged: 30-60 min") {
    assert(parseOne("30-60 min").getBoolean(5))
  }

  test("no hint clamps hours: 18:00–20:00") {
    val r = parseOne("18:00–20:00")
    // 2nd numeric token is '00' → end '00:00' (reference tokenizer quirk)
    assert(r.getString(1) === "18:00-00:00" && r.getString(4) === "evening")
  }
}
