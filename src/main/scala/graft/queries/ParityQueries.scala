package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Kernels._
import graft.functions.{PipelineVars, SlotParser}
import graft.sources.Tables

/** Reference-parity surface round 2: structured JSON extraction with a
  * declared schema, the delivery-slot text parser, timezone conversion,
  * and the ex-VAT back-out price path with typed config.
  */
object ParityQueries {

  // --- q33 helpers: deterministic invoice JSON built from orders --------
  // (both engines build the identical string, then each parses with its
  // own JSON machinery — the parse is the operator under test)
  private val InvoiceJsonSql = """
    '{"invoice_id":"' || o_orderkey ||
    '","customer_id":"' || o_custkey ||
    '","date":"' || strftime(o_orderdate, '%Y-%m-%d') ||
    '","due_date":"' || CASE WHEN o_orderkey % 7 = 0 THEN '' ELSE strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') END ||
    '","last_payment_date":"' || CASE WHEN o_orderkey % 5 = 0 THEN '' ELSE strftime(o_orderdate + INTERVAL 10 DAY, '%Y-%m-%d') END ||
    '","currency_code":"aed","status":"' ||
    CASE o_orderkey % 6 WHEN 0 THEN 'PAID' WHEN 1 THEN 'Partially_Paid' WHEN 2 THEN 'draft'
                        WHEN 3 THEN 'void' WHEN 4 THEN 'unpaid' ELSE 'overdue' END ||
    '","total_cents":' || CAST(round(o_totalprice * 100) AS BIGINT) ||
    ',"balance_cents":' || CASE WHEN o_orderkey % 3 = 0 THEN 0
                                ELSE CAST(round(o_totalprice * 100) AS BIGINT) % 10000 END || '}'"""

  private def invoiceJsonSpark = {
    val totalCents = round(col("o_totalprice") * 100).cast("long")
    concat(
      lit("{\"invoice_id\":\""), col("o_orderkey"),
      lit("\",\"customer_id\":\""), col("o_custkey"),
      lit("\",\"date\":\""), date_format(col("o_orderdate"), "yyyy-MM-dd"),
      lit("\",\"due_date\":\""),
      when(col("o_orderkey") % 7 === 0, "")
        .otherwise(date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd")),
      lit("\",\"last_payment_date\":\""),
      when(col("o_orderkey") % 5 === 0, "")
        .otherwise(date_format(date_add(col("o_orderdate"), 10), "yyyy-MM-dd")),
      lit("\",\"currency_code\":\"aed\",\"status\":\""),
      when(col("o_orderkey") % 6 === 0, "PAID")
        .when(col("o_orderkey") % 6 === 1, "Partially_Paid")
        .when(col("o_orderkey") % 6 === 2, "draft")
        .when(col("o_orderkey") % 6 === 3, "void")
        .when(col("o_orderkey") % 6 === 4, "unpaid")
        .otherwise("overdue"),
      lit("\",\"total_cents\":"), totalCents,
      lit(",\"balance_cents\":"),
      when(col("o_orderkey") % 3 === 0, lit(0L)).otherwise(totalCents % 10000),
      lit("}"))
  }

  private val invoiceSchema = StructType(Seq(
    StructField("invoice_id", StringType), StructField("customer_id", StringType),
    StructField("date", StringType), StructField("due_date", StringType),
    StructField("last_payment_date", StringType), StructField("currency_code", StringType),
    StructField("status", StringType), StructField("total_cents", LongType),
    StructField("balance_cents", LongType)))

  // --- q53 helpers: deterministic shipment JSON built from orders -------
  // 13 typed fields (reference stg_shipments.sql:13-26); shipment_id pairs
  // consecutive orderkeys so dedup-keep-latest has real duplicates to
  // resolve; status cycles through the 5 canonical values plus
  // 'dispatched' and '' to exercise the default-'shipped' else-branch.
  private val ShipmentJsonSql = """
    '{"shipment_id":"' || (o_orderkey - o_orderkey % 2) ||
    '","package_id":"PKG' || o_orderkey ||
    '","package_number":"PN-' || (o_orderkey % 1000) ||
    '","status":"' ||
    CASE o_orderkey % 7 WHEN 0 THEN 'shipped' WHEN 1 THEN 'in_transit'
                        WHEN 2 THEN 'Delivered' WHEN 3 THEN 'failed'
                        WHEN 4 THEN 'returned' WHEN 5 THEN 'dispatched' ELSE '' END ||
    '","tracking_number":"TRK' || (o_orderkey * 7919 % 100000) ||
    '","shipping_date":"' || CASE WHEN o_orderkey % 5 = 0 THEN '' ELSE strftime(o_orderdate + INTERVAL 2 DAY, '%Y-%m-%d') END ||
    '","delivery_date":"' || CASE WHEN o_orderkey % 4 = 0 THEN '' ELSE strftime(o_orderdate + INTERVAL 5 DAY, '%Y-%m-%d') END ||
    '","delivery_method":"' || CASE o_orderkey % 3 WHEN 0 THEN 'courier' WHEN 1 THEN 'pickup' ELSE 'locker' END ||
    '","date":"' || strftime(o_orderdate + (o_orderkey % 2) * INTERVAL 1 DAY, '%Y-%m-%d') ||
    '","customer_id":"' || o_custkey ||
    '","customer_name":"Cust ' || o_custkey ||
    '","salesorder_id":"' || o_orderkey ||
    '","salesorder_number":"SO-' || o_orderkey || '"}'"""

  private def shipmentJsonSpark = concat(
    lit("{\"shipment_id\":\""), col("o_orderkey") - col("o_orderkey") % 2,
    lit("\",\"package_id\":\"PKG"), col("o_orderkey"),
    lit("\",\"package_number\":\"PN-"), col("o_orderkey") % 1000,
    lit("\",\"status\":\""),
    when(col("o_orderkey") % 7 === 0, "shipped").when(col("o_orderkey") % 7 === 1, "in_transit")
      .when(col("o_orderkey") % 7 === 2, "Delivered").when(col("o_orderkey") % 7 === 3, "failed")
      .when(col("o_orderkey") % 7 === 4, "returned").when(col("o_orderkey") % 7 === 5, "dispatched")
      .otherwise(""),
    lit("\",\"tracking_number\":\"TRK"), col("o_orderkey") * 7919 % 100000,
    lit("\",\"shipping_date\":\""),
    when(col("o_orderkey") % 5 === 0, "")
      .otherwise(date_format(date_add(col("o_orderdate"), 2), "yyyy-MM-dd")),
    lit("\",\"delivery_date\":\""),
    when(col("o_orderkey") % 4 === 0, "")
      .otherwise(date_format(date_add(col("o_orderdate"), 5), "yyyy-MM-dd")),
    lit("\",\"delivery_method\":\""),
    when(col("o_orderkey") % 3 === 0, "courier").when(col("o_orderkey") % 3 === 1, "pickup")
      .otherwise("locker"),
    lit("\",\"date\":\""),
    date_format(expr("date_add(o_orderdate, cast(o_orderkey % 2 as int))"), "yyyy-MM-dd"),
    lit("\",\"customer_id\":\""), col("o_custkey"),
    lit("\",\"customer_name\":\"Cust "), col("o_custkey"),
    lit("\",\"salesorder_id\":\""), col("o_orderkey"),
    lit("\",\"salesorder_number\":\"SO-"), col("o_orderkey"), lit("\"}"))

  private val shipmentSchema = StructType(Seq(
    "shipment_id", "package_id", "package_number", "status", "tracking_number",
    "shipping_date", "delivery_date", "delivery_method", "date",
    "customer_id", "customer_name", "salesorder_id", "salesorder_number")
    .map(StructField(_, StringType)))

  // --- q34 helpers: slot text corpus derived from orders ----------------
  private val SlotCaseSql = """CASE o_orderkey % 10
      WHEN 0 THEN '8am - 10am'      WHEN 1 THEN '10:30 - 12:30 PM'
      WHEN 2 THEN '2  PM – 4  PM'   WHEN 3 THEN 'Morning 9 - 11'
      WHEN 4 THEN 'evening 6—8'     WHEN 5 THEN '18:00–20:00'
      WHEN 6 THEN '30-60 min'       WHEN 7 THEN '12pm - 2pm'
      WHEN 8 THEN '12am - 1:15am'   ELSE NULL END"""

  private def slotCaseSpark = {
    val k = col("o_orderkey") % 10
    when(k === 0, "8am - 10am").when(k === 1, "10:30 - 12:30 PM")
      .when(k === 2, "2  PM – 4  PM").when(k === 3, "Morning 9 - 11")
      .when(k === 4, "evening 6—8").when(k === 5, "18:00–20:00")
      .when(k === 6, "30-60 min").when(k === 7, "12pm - 2pm")
      .when(k === 8, "12am - 1:15am")
  }

  /** Shared downstream of the invoice extraction — used by BOTH the
    * declared-StructType path (q33) and the VARIANT path (q80), so the
    * two parse strategies are gated against the identical oracle. Input
    * must carry the nine extracted invoice fields as top-level columns. */
  private def invoicePayments(fields: org.apache.spark.sql.DataFrame) = {
    val srcStatus = lower(col("status"))
    val canonical = when(srcStatus === "paid" && col("balance_cents") === 0, "paid")
      .when(srcStatus.isin("paid", "partially_paid") && col("balance_cents") > 0, "partially_paid")
      .when(srcStatus === "draft", "draft")
      .when(srcStatus === "void", "void")
      .when(srcStatus.isin("unpaid", "overdue"), "unpaid")
      .otherwise(coalesce(srcStatus, lit("unknown")))
    val invoiceDate = to_date(col("date"))
    val paidCents   = greatest(col("total_cents") - col("balance_cents"), lit(0L))
    val paymentDate = coalesce(
      when(col("last_payment_date") === "", null)
        .otherwise(to_date(col("last_payment_date"))),
      when(col("total_cents") - col("balance_cents") > 0, invoiceDate))
    fields.select(
        col("invoice_id"), col("customer_id"),
        invoiceDate.as("invoice_date"),
        when(col("due_date") === "", null).otherwise(to_date(col("due_date"))).as("due_date"),
        paymentDate.as("payment_date"),
        canonical.as("status_canonical"),
        (col("total_cents").cast("double") / 100.0d).as("total_amount"),
        (paidCents.cast("double") / 100.0d).as("amount_paid"),
        (col("balance_cents").cast("double") / 100.0d).as("balance"),
        upper(col("currency_code")).as("currency_code"),
        surrogateKey(lit("zoho_invoice"), col("invoice_id"),
          coalesce(date_format(paymentDate, "yyyy-MM-dd"),
            date_format(invoiceDate, "yyyy-MM-dd"))).as("payment_id"))
      .where(col("status_canonical").isin("paid", "partially_paid"))
      .orderBy(col("invoice_id").cast("long"))
  }

  val defs: Seq[QueryDef] = Seq(

    // §2.7 JSON: from_json with a DECLARED StructType reproducing the
    // invoice extraction incl. nullif(f,'')::date, status
    // canonicalization, amount_paid/payment_date derivation and the
    // paid-only filter (reference stg_invoice_payments.sql:17-48,57-77).
    QueryDef(
      "q33_json_struct_invoices",
      (s, dir) => {
        // per-row JSON build + from_json parse over every order: the 3 MB
        // sf-file scan packs into ONE split, serializing the parse — fan
        // out first (Skew.fanOutRead, no-op on a well-split deployment)
        val o  = graft.operators.Skew.fanOutRead(Tables.orders(s, dir))
        val j  = from_json(invoiceJsonSpark, invoiceSchema)
        // explode(array(j)) is an optimizer BARRIER: predicate pushdown
        // cannot move a filter below a Generate whose output it references,
        // so the status filter below stays above ONE from_json. Without it,
        // PushPredicateThroughNonJoin substitutes the alias and inlines
        // EIGHT single-field from_json re-parses into the pushed filter
        // (measured: 20.6 s → the whole query re-parsed the JSON 9× per row).
        val withJ = o.select(explode(array(j)).as("j"))
          .select(col("j.*"))
        invoicePayments(withJ)
      },
      Some(InvoiceOracleSql)),

    // §2.7 JSON, the Spark-4 VARIANT path: the same nine-field invoice
    // pipeline but through parse_json → variant_get — the engine surface
    // matching Snowflake's actual `variant` column semantics (the
    // reference's source tables declare variant payloads). One parse per
    // row builds the binary variant; each variant_get is a cheap binary
    // path lookup, NOT a JSON re-parse — but the Generate barrier stays,
    // keeping the single parse_json below any pushed filter. Gated against
    // the IDENTICAL oracle as q33, so struct-path and variant-path
    // extraction can never drift.
    QueryDef(
      "q80_variant_invoices",
      (s, dir) => {
        // same under-split scan as q33; parse_json + variant_get is the
        // per-row hot path — fan out to every core first
        val o = graft.operators.Skew.fanOutRead(Tables.orders(s, dir))
        val v = parse_json(invoiceJsonSpark)
        // ONE struct-typed variant_get extracts all nine fields in a
        // single binary traversal (vs nine per-field gets — and vs the
        // first cut, where the pushed-down status filter inlined
        // variant_get(status)/variant_get(balance) SIX more times per
        // row: tri-scale run alpha 1.41, 132 s at sf1). The Generate
        // barrier pins the single parse_json+get below any pushed
        // filter; downstream references are plain struct-field accesses.
        val fields = o.select(explode(array(variant_get(v, "$",
            "STRUCT<invoice_id: STRING, customer_id: STRING, date: STRING, " +
              "due_date: STRING, last_payment_date: STRING, " +
              "currency_code: STRING, status: STRING, total_cents: BIGINT, " +
              "balance_cents: BIGINT>"))).as("f"))
          .select(col("f.*"))
        invoicePayments(fields)
      },
      Some(InvoiceOracleSql))) ++ moreDefs

  /** The invoice oracle shared by q33 (struct path) and q80 (VARIANT). */
  private lazy val InvoiceOracleSql = s"""
        WITH j AS (SELECT $InvoiceJsonSql AS js FROM orders),
        base AS (
          SELECT json_extract_string(js,'$$.invoice_id') AS invoice_id,
                 json_extract_string(js,'$$.customer_id') AS customer_id,
                 CAST(json_extract_string(js,'$$.date') AS DATE) AS invoice_date,
                 CAST(NULLIF(json_extract_string(js,'$$.due_date'),'') AS DATE) AS due_date,
                 NULLIF(json_extract_string(js,'$$.last_payment_date'),'') AS last_pay_raw,
                 upper(json_extract_string(js,'$$.currency_code')) AS currency_code,
                 lower(json_extract_string(js,'$$.status')) AS src_status,
                 CAST(json_extract_string(js,'$$.total_cents') AS BIGINT) AS total_cents,
                 CAST(json_extract_string(js,'$$.balance_cents') AS BIGINT) AS balance_cents
          FROM j),
        norm AS (
          SELECT *,
            CASE WHEN src_status = 'paid' AND balance_cents = 0 THEN 'paid'
                 WHEN src_status IN ('paid','partially_paid') AND balance_cents > 0 THEN 'partially_paid'
                 WHEN src_status = 'draft' THEN 'draft'
                 WHEN src_status = 'void' THEN 'void'
                 WHEN src_status IN ('unpaid','overdue') THEN 'unpaid'
                 ELSE COALESCE(src_status,'unknown') END AS status_canonical,
            GREATEST(total_cents - balance_cents, 0) AS paid_cents,
            COALESCE(CAST(last_pay_raw AS DATE),
                     CASE WHEN total_cents - balance_cents > 0 THEN invoice_date END) AS payment_date
          FROM base)
        SELECT invoice_id, customer_id, invoice_date, due_date, payment_date,
               status_canonical,
               total_cents::DOUBLE / 100.0::DOUBLE AS total_amount,
               paid_cents::DOUBLE / 100.0::DOUBLE AS amount_paid,
               balance_cents::DOUBLE / 100.0::DOUBLE AS balance,
               currency_code,
               md5('zoho_invoice' || '-' || invoice_id || '-' ||
                   COALESCE(strftime(payment_date,'%Y-%m-%d'), strftime(invoice_date,'%Y-%m-%d'))) AS payment_id
        FROM norm
        WHERE status_canonical IN ('paid','partially_paid')
        ORDER BY CAST(invoice_id AS BIGINT)"""

  private lazy val moreDefs: Seq[QueryDef] = Seq(

    // §2.7 JSON shape #2: the shipments extraction (reference
    // stg_shipments.sql:13-66) — 13 typed fields, `nullif(f,'')::date` on
    // the two shipping dates, a status decode whose else-branch DEFAULTS
    // to 'shipped' (:29-40, the one default-else canonicalization in the
    // reference), and dedup-keep-latest on shipment_id (:43-49).
    QueryDef(
      "q53_json_shipments",
      (s, dir) => {
        // same under-split scan + from_json hot path as q33 — fan out
        val o = graft.operators.Skew.fanOutRead(Tables.orders(s, dir))
        val j = from_json(shipmentJsonSpark, shipmentSchema)
        // same Generate barrier as q33: keeps exactly ONE from_json even
        // with the window + final sort referencing parsed fields
        val base = o.select(explode(array(j)).as("j")).select(col("j.*"))
        def nulldate(c: org.apache.spark.sql.Column) =
          when(c === "", null).otherwise(to_date(c))
        val srcStatus = lower(coalesce(col("status"), lit("")))
        val norm = base.select(
          col("shipment_id"), col("package_id"), col("package_number"),
          when(srcStatus === "shipped", "shipped")
            .when(srcStatus === "in_transit", "in_transit")
            .when(srcStatus === "delivered", "delivered")
            .when(srcStatus === "failed", "failed")
            .when(srcStatus === "returned", "returned")
            .otherwise("shipped").as("status_canonical"),
          col("tracking_number"),
          nulldate(col("shipping_date")).as("shipped_at"),
          nulldate(col("delivery_date")).as("delivered_at"),
          col("delivery_method"),
          to_date(col("date")).as("shipment_created_date"),
          col("customer_id"), col("customer_name"),
          col("salesorder_id"), col("salesorder_number"))
        // keep-latest; salesorder_id breaks created/shipped/delivered-date
        // ties so the winner is total-ordered on both engines (the
        // reference's row_number has no tiebreak — underdetermined there)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shipment_id"))
          .orderBy(col("shipment_created_date").desc_nulls_last,
            col("shipped_at").desc_nulls_last, col("delivered_at").desc_nulls_last,
            col("salesorder_id").cast("long").desc)
        norm.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1).drop("rn")
          .orderBy(col("shipment_id").cast("long"))
      },
      Some(s"""
        WITH src AS (SELECT $ShipmentJsonSql AS js FROM orders),
        base AS (
          SELECT json_extract_string(js,'$$.shipment_id')   AS shipment_id,
                 json_extract_string(js,'$$.package_id')    AS package_id,
                 json_extract_string(js,'$$.package_number') AS package_number,
                 json_extract_string(js,'$$.status')        AS src_status,
                 json_extract_string(js,'$$.tracking_number') AS tracking_number,
                 CAST(NULLIF(json_extract_string(js,'$$.shipping_date'),'') AS DATE) AS shipped_at,
                 CAST(NULLIF(json_extract_string(js,'$$.delivery_date'),'') AS DATE) AS delivered_at,
                 json_extract_string(js,'$$.delivery_method') AS delivery_method,
                 CAST(json_extract_string(js,'$$.date') AS DATE) AS shipment_created_date,
                 json_extract_string(js,'$$.customer_id')   AS customer_id,
                 json_extract_string(js,'$$.customer_name') AS customer_name,
                 json_extract_string(js,'$$.salesorder_id') AS salesorder_id,
                 json_extract_string(js,'$$.salesorder_number') AS salesorder_number
          FROM src),
        norm AS (
          SELECT *,
            CASE lower(COALESCE(src_status,''))
              WHEN 'shipped'    THEN 'shipped'
              WHEN 'in_transit' THEN 'in_transit'
              WHEN 'delivered'  THEN 'delivered'
              WHEN 'failed'     THEN 'failed'
              WHEN 'returned'   THEN 'returned'
              ELSE 'shipped' END AS status_canonical
          FROM base),
        dedup AS (
          SELECT *, row_number() OVER (PARTITION BY shipment_id ORDER BY
                      shipment_created_date DESC NULLS LAST,
                      shipped_at DESC NULLS LAST, delivered_at DESC NULLS LAST,
                      CAST(salesorder_id AS BIGINT) DESC) AS rn
          FROM norm)
        SELECT shipment_id, package_id, package_number, status_canonical,
               tracking_number, shipped_at, delivered_at, delivery_method,
               shipment_created_date, customer_id, customer_name,
               salesorder_id, salesorder_number
        FROM dedup WHERE rn = 1
        ORDER BY CAST(shipment_id AS BIGINT)""")),

    // §2.7 the delivery-slot parser: nth-occurrence regexp extraction,
    // group extraction, lpad, am/pm inference, 24h clamp, period buckets
    // (reference stg_delivery_slots.sql:23-119).
    QueryDef(
      "q34_delivery_slots",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val raw = o.select(slotCaseSpark.as("dt"))
          .where(col("dt").isNotNull && trim(col("dt")) =!= "")
        val norm = raw.select(SlotParser.normalizeSlotText(col("dt")).as("slot_txt")).distinct()
        val parsed = norm.select(col("slot_txt") +: SlotParser.parse(col("slot_txt")): _*)
        def minutes(t: org.apache.spark.sql.Column) =
          substring(t, 1, 2).try_cast(LongType) * 60 + substring(t, 4, 2).try_cast(LongType)
        parsed.where(!col("is_duration"))
          .select(
            surrogateKey(col("delivery_slot")).as("delivery_slot_id"),
            col("slot_txt"), col("delivery_slot"),
            col("start_time"), col("end_time"),
            minutes(col("start_time")).as("start_minutes"),
            minutes(col("end_time")).as("end_minutes"),
            col("slot_period"))
          .orderBy(col("slot_txt"))
      },
      Some(s"""
        WITH raw AS (SELECT $SlotCaseSql AS dt FROM orders),
        norm AS (
          SELECT DISTINCT lower(trim(regexp_replace(replace(replace(dt,'–','-'),'—','-'), '\\s+', ' ', 'g'))) AS slot_txt
          FROM raw WHERE dt IS NOT NULL AND trim(dt) <> ''),
        parsed AS (
          SELECT slot_txt,
                 (slot_txt LIKE '%am%') AS has_am, (slot_txt LIKE '%pm%') AS has_pm,
                 (slot_txt LIKE '%morning%') AS has_morning,
                 (slot_txt LIKE '%afternoon%') AS has_afternoon,
                 (slot_txt LIKE '%evening%') AS has_evening,
                 COALESCE(TRY_CAST(regexp_extract_all(slot_txt,'\\d{1,2}')[1] AS INT), 0) AS t1,
                 COALESCE(TRY_CAST(regexp_extract_all(slot_txt,'\\d{1,2}')[2] AS INT), 0) AS t2,
                 COALESCE(regexp_extract_all(slot_txt,':(\\d{2})',1)[1], '00') AS m1,
                 COALESCE(regexp_extract_all(slot_txt,':(\\d{2})',1)[2], '00') AS m2
          FROM norm),
        hinted AS (
          SELECT *,
            CASE WHEN has_am AND NOT has_pm THEN 'am'
                 WHEN has_pm AND NOT has_am THEN 'pm'
                 WHEN has_morning THEN 'am'
                 WHEN has_evening OR has_afternoon THEN 'pm' END AS hint
          FROM parsed),
        to24 AS (
          SELECT *,
            lpad(CAST(CASE WHEN hint='am' THEN (CASE WHEN t1=12 THEN 0 ELSE t1 END)
                           WHEN hint='pm' THEN (CASE WHEN t1<12 THEN t1+12 ELSE t1 END)
                           ELSE LEAST(GREATEST(t1,0),23) END AS VARCHAR), 2, '0') AS t1h,
            lpad(CAST(CASE WHEN hint='am' THEN (CASE WHEN t2=12 THEN 0 ELSE t2 END)
                           WHEN hint='pm' THEN (CASE WHEN t2<12 THEN t2+12 ELSE t2 END)
                           ELSE LEAST(GREATEST(t2,0),23) END AS VARCHAR), 2, '0') AS t2h,
            (has_am OR has_pm) AS has_ampm,
            (slot_txt LIKE '%min%') AS has_min_word
          FROM hinted),
        canon AS (
          SELECT slot_txt,
            CASE WHEN len(regexp_extract_all(slot_txt,'\\d')) >= 2
                      AND (has_ampm OR slot_txt LIKE '%:%')
                 THEN t1h||':'||lpad(m1,2,'0')||'-'||t2h||':'||lpad(m2,2,'0') END AS delivery_slot,
            CASE WHEN regexp_matches(t1h, '^(0\\d|1\\d|2[0-3]|\\d)$$')
                 THEN t1h||':'||lpad(m1,2,'0')||':00' END AS start_time,
            CASE WHEN regexp_matches(t2h, '^(0\\d|1\\d|2[0-3]|\\d)$$')
                 THEN t2h||':'||lpad(m2,2,'0')||':00' END AS end_time
          FROM to24
          WHERE NOT (has_min_word AND NOT has_ampm AND strpos(slot_txt, ':') = 0))
        SELECT md5(COALESCE(delivery_slot, '$SkNullSentinel')) AS delivery_slot_id,
               slot_txt, delivery_slot, start_time, end_time,
               TRY_CAST(substring(start_time,1,2) AS BIGINT) * 60 + TRY_CAST(substring(start_time,4,2) AS BIGINT) AS start_minutes,
               TRY_CAST(substring(end_time,1,2) AS BIGINT) * 60 + TRY_CAST(substring(end_time,4,2) AS BIGINT) AS end_minutes,
               CASE WHEN TRY_CAST(substring(start_time,1,2) AS INT) BETWEEN 5 AND 11 THEN 'morning'
                    WHEN TRY_CAST(substring(start_time,1,2) AS INT) BETWEEN 12 AND 16 THEN 'afternoon'
                    WHEN TRY_CAST(substring(start_time,1,2) AS INT) BETWEEN 17 AND 21 THEN 'evening'
                    ELSE 'other' END AS slot_period
        FROM canon
        ORDER BY slot_txt""")),

    // §2.7 timezone conversion with coalesce fallback (reference
    // stg_orders.sql:17-21: convert_timezone('Asia/Dubai','UTC', ts)).
    QueryDef(
      "q35_timezone_utc",
      (s, dir) => {
        val ev  = Tables.events(s, dir)
        val tsn = when(col("event_id") % 97 === 0, null).otherwise(col("ts"))
        val anchor = lit("2024-02-01 00:00:00").cast("timestamp")
        val utc = coalesce(to_utc_timestamp(tsn, "Asia/Dubai"), anchor)
        ev.select(col("event_type"), tsn.as("tsn"), utc.as("utc"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            min(col("utc")).as("min_utc"), max(col("utc")).as("max_utc"),
            sum(when(col("tsn").isNull, 1L).otherwise(0L)).as("n_fallback"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH t AS (
          SELECT event_type,
                 CASE WHEN event_id % 97 = 0 THEN NULL ELSE ts END AS tsn,
                 COALESCE(timezone('UTC', timezone('Asia/Dubai',
                            CASE WHEN event_id % 97 = 0 THEN NULL ELSE ts END)),
                          TIMESTAMP '2024-02-01 00:00:00') AS utc
          FROM events)
        SELECT event_type, COUNT(*) AS n,
               MIN(utc) AS min_utc, MAX(utc) AS max_utc,
               CAST(SUM(CASE WHEN tsn IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_fallback
        FROM t GROUP BY event_type ORDER BY event_type""")),

    // §2.2 ex-VAT back-out price path with typed config (reference
    // stg_items.sql:29-42: price/(1+var('vat_rate')), clamped discount pct).
    QueryDef(
      "q36_exvat_prices",
      (s, dir) => {
        val vars = PipelineVars.default
        val li = Tables.lineitem(s, dir)
        val hasVat = col("l_partkey") % 2 === 1
        li.select(
            col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            hasVat.as("has_vat"),
            when(hasVat, col("l_extendedprice") / lit(1.0d + vars.vatRate))
              .otherwise(col("l_extendedprice")).as("unit_price_ex_vat"),
            least(lit(1.0d), greatest(lit(0.0d),
              (coalesce(col("l_discount"), lit(0.0d)) * 100 +
                coalesce(col("l_tax"), lit(0.0d)) * 100) / 100.0d)).as("total_discount_pct"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_orderkey,
               CAST(l_linenumber AS BIGINT) AS l_linenumber,
               (l_partkey % 2 = 1) AS has_vat,
               CASE WHEN l_partkey % 2 = 1 THEN l_extendedprice / 1.05::DOUBLE
                    ELSE l_extendedprice END AS unit_price_ex_vat,
               LEAST(1.0::DOUBLE, GREATEST(0.0::DOUBLE,
                 (COALESCE(l_discount, 0.0::DOUBLE) * 100 + COALESCE(l_tax, 0.0::DOUBLE) * 100) / 100.0::DOUBLE)) AS total_discount_pct
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""")))
}
