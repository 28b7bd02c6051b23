package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Delivery-slot text parser — the reference's hardest scalar kernel
  * (reference models/staging/stg_delivery_slots.sql:23-119): normalize
  * dashes/whitespace, pull the first two numeric tokens as hours and the
  * first two ":MM" groups as minutes, infer am/pm from markers, convert
  * to 24h with clamping, build the canonical "HH:MM-HH:MM" slot, and
  * bucket the start hour into a period.
  *
  * Faithful to the reference's quirks (e.g. "10:30 - 12:30 pm" takes the
  * SECOND numeric token "30" as the end hour and then fails the
  * 0-23 validity regex, nulling end_time) — semantics, not cleanup.
  * All pure Column kernels; nth-occurrence extraction uses
  * regexp_extract_all + try_element_at (Snowflake regexp_substr(…,n) and
  * the 'e' group flag have no direct Spark twin).
  */
object SlotParser {

  /** lower(trim(collapse whitespace(en/em dash → '-'))) — reference
    * stg_orders.sql:26-32 and stg_delivery_slots.sql:8-14. */
  def normalizeSlotText(c: Column): Column =
    lower(trim(regexp_replace(
      translate(c, "–—", "--"), "\\s+", " ")))

  /** n-th (1-based) match of `re` in `c`, null when absent —
    * Snowflake regexp_substr(c, re, 1, n). */
  def nthMatch(c: Column, re: String, n: Int): Column =
    try_element_at(regexp_extract_all(c, lit(re), lit(0)), lit(n))

  /** n-th (1-based) occurrence of capture-group 1 — Snowflake
    * regexp_substr(c, re, 1, n, 'e', 1). */
  def nthGroup(c: Column, re: String, n: Int): Column =
    try_element_at(regexp_extract_all(c, lit(re), lit(1)), lit(n))

  /** Full parse: returns the struct of columns the reference model emits.
    * Input must already be normalized (normalizeSlotText). */
  def parse(slot: Column): Seq[Column] = {
    val hasAm        = slot.contains("am")
    val hasPm        = slot.contains("pm")
    val hasMorning   = slot.contains("morning")
    val hasAfternoon = slot.contains("afternoon")
    val hasEvening   = slot.contains("evening")

    val t1hhRaw = coalesce(nthMatch(slot, "\\d{1,2}", 1).cast("int"), lit(0))
    val t2hhRaw = coalesce(nthMatch(slot, "\\d{1,2}", 2).cast("int"), lit(0))
    val t1mmRaw = coalesce(nthGroup(slot, ":(\\d{2})", 1), lit("00"))
    val t2mmRaw = coalesce(nthGroup(slot, ":(\\d{2})", 2), lit("00"))

    // single am/pm hint (reference calc CTE, :50-57)
    val hint = when(hasAm && !hasPm, "am")
      .when(hasPm && !hasAm, "pm")
      .when(hasMorning, "am")
      .when(hasEvening || hasAfternoon, "pm")

    def to24(hh: Column): Column = lpad(
      when(hint === "am", when(hh === 12, 0).otherwise(hh))
        .when(hint === "pm", when(hh < 12, hh + 12).otherwise(hh))
        .otherwise(Kernels.clamp(hh, lit(0), lit(23)))
        .cast("string"), 2, "0")

    val t1hh24 = to24(t1hhRaw)
    val t2hh24 = to24(t2hhRaw)

    val hasAmPm    = hasAm || hasPm
    val hasMinWord = slot.contains("min")
    val digitCount = size(regexp_extract_all(slot, lit("\\d"), lit(0)))

    // canonical HH:MM-HH:MM (reference canon CTE, :86-93)
    val deliverySlot = when(
      digitCount >= 2 && (hasAmPm || slot.contains(":")),
      concat(t1hh24, lit(":"), lpad(t1mmRaw, 2, "0"),
        lit("-"), t2hh24, lit(":"), lpad(t2mmRaw, 2, "0")))

    val validHour = "^(0\\d|1\\d|2[0-3]|\\d)$"
    def timeStr(hh24: Column, mm: Column): Column =
      when(hh24.rlike(validHour), concat(hh24, lit(":"), lpad(mm, 2, "0"), lit(":00")))

    val startTime = timeStr(t1hh24, t1mmRaw)
    val endTime   = timeStr(t2hh24, t2mmRaw)

    val startHour = substring(startTime, 1, 2).cast("int")
    val slotPeriod = when(startHour.between(5, 11), "morning")
      .when(startHour.between(12, 16), "afternoon")
      .when(startHour.between(17, 21), "evening")
      .otherwise("other")

    // duration-string filter flag (reference canon WHERE, :95-96)
    val isDuration = hasMinWord && !hasAmPm && !slot.contains(":")

    Seq(
      deliverySlot.as("delivery_slot"),
      startTime.as("start_time"),
      endTime.as("end_time"),
      slotPeriod.as("slot_period"),
      isDuration.as("is_duration"))
  }
}
