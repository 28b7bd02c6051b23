package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.functions.SlotParser
import graft.operators.AsOfJoin
import graft.sources.Tables

/** The reference DAG as a NAME-ADDRESSABLE catalog: every non-empty model
  * in the reference project (15 staging + 10 marts; the 9 dim/aggregate
  * placeholders in the reference are 0-byte files) registered as a
  * Pipeline node under its reference name, with the reference's `ref()`
  * dependency edges. A user porting from the reference runs any model by
  * name — `ModelCatalog(spark, dir).build("fct_orders")` — and shared
  * upstream models (stg_orders feeds five consumers, as in the reference)
  * are scanned once via the Pipeline's automatic materialize-on-shared-dep
  * (localCheckpoint — pin-neutral, see Pipeline).
  *
  * Node bodies are compact Spark twins over the testdata star schema; the
  * full per-model semantics (money math, JSON shapes, slot parsing,
  * dedup) are oracle-gated by the q-suite — see the per-node citations.
  * Where the synthetic schema lacks a source the reference has (users,
  * transactions, packages), the node synthesizes deterministic rows from
  * keys so the lineage stays runnable end-to-end.
  */
object ModelCatalog {

  private val D = DecimalType(18, 6)
  private def d6(c: Column) = c.cast(D)

  /** All registered model names, staging first (reference layout order).
    * Includes every DECLARED model: the reference ships 9 of these as
    * 0-byte placeholder files (its stated roadmap — dims/dim_address..
    * dim_promo, aggregates/agg_*_daily); they are implemented here so a
    * reference user hitting the declared catalog by name never misses. */
  val modelNames: Seq[String] = Seq(
    "stg_orders", "stg_order_items", "stg_customers", "stg_addresses",
    "stg_users", "stg_transactions", "stg_items", "stg_invoices_ar",
    "stg_invoice_payments", "stg_shipments", "stg_delivery_slots",
    "stg_packages", "stg_product_brands", "stg_product_categories",
    "stg_product_details",
    "dim_customer", "dim_orders",
    "dim_address", "dim_date", "dim_delivery_slot", "dim_device",
    "dim_payment_method", "dim_product", "dim_promo",
    "fct_order_items", "fct_orders", "fct_orders_revenue",
    "fct_customer_monthly_revenue", "customer_revenue_ltv",
    "cohort_revenue_ltv", "first_channel_ltv", "fct_customers",
    "agg_orders_daily", "agg_items_daily")

  def apply(spark: SparkSession, dir: String): Pipeline = {
    val p = new Pipeline

    // ---------------- staging (reference models/staging/*) ----------------

    // stg_orders.sql:1-60 — conformed orders: ids, UTC + local timestamps,
    // status decode, synthesized order-level VAT and channel (q13/q35/q55).
    p.register("stg_orders") { _ =>
      val o = Tables.orders(spark, dir)
      val k = col("o_orderkey")
      o.select(
        k.as("order_id"), col("o_custkey").as("customer_id"),
        col("o_orderdate").as("created_at_utc"),
        convert_timezone(lit("UTC"), lit("Asia/Dubai"), col("o_orderdate"))
          .as("created_at_local"),
        to_date(col("o_orderdate")).as("order_date"),
        when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "F", "fulfilled")
          .when(col("o_orderstatus") === "P", "pending")
          .otherwise("unknown").as("status_canonical"),
        d6((k % 3) * 5).as("vat_pct"),
        when(k % 5 === 0, "web").when(k % 5 === 1, "app")
          .when(k % 5 === 2, "phone").when(k % 5 === 3, "store")
          .otherwise("partner").as("channel"))
    }

    // stg_order_items.sql:1-60 — typed line items with the three discount
    // sources and application types (gated end-to-end by q52).
    p.register("stg_order_items") { _ =>
      // Widest per-row money path in the catalog (feeds fct_order_items →
      // fct_orders → the agg models); fan the under-split sf-file scan out
      // so the decimal chain uses every core (Skew.fanOutRead — no-op on a
      // well-split deployment).
      val li = graft.operators.Skew.fanOutRead(Tables.lineitem(spark, dir))
      li.select(
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("order_item_id"),
        col("l_orderkey").as("order_id"), col("l_partkey").as("product_id"),
        d6(col("l_quantity")).as("quantity"),
        d6(col("l_extendedprice")).as("unit_price"),
        (col("l_partkey") % 2 === 1).as("has_vat"),
        coalesce(d6(col("l_discount") * 100), d6(lit(0))).as("discount_pct"),
        upper(coalesce(when(col("l_linenumber") % 3 === 0, "PERCENTAGE")
          .when(col("l_linenumber") % 3 === 1, "amount"), lit("PERCENTAGE")))
          .as("discount_application_type"))
    }

    // stg_customers.sql:1-117 — cleanup kernels: brand-suffix strip,
    // blank→null segment (q40).
    p.register("stg_customers") { _ =>
      Tables.customer(spark, dir).select(
        col("c_custkey").as("customer_id"),
        trim(regexp_replace(col("c_name"), "(?i)furchild:.*$", "")).as("full_name"),
        nullifTrim(col("c_mktsegment")).as("segment"),
        col("c_nationkey").as("nation_id"),
        col("c_acctbal").as("account_balance"))
    }

    // stg_addresses.sql:13-32 — the two-version address book the as-of
    // pick consumes (q47's synthesized twin).
    p.register("stg_addresses") { _ =>
      Tables.customer(spark, dir).select(col("c_custkey").as("customer_id"),
          col("c_mktsegment").as("segment"), explode(array(lit(0), lit(1))).as("v"))
        .select(col("customer_id"),
          concat(col("segment"), lit("#v"), col("v")).as("ship_area"),
          (col("customer_id") * 2 + col("v")).as("addr_id"),
          to_timestamp(date_add(lit("1993-01-01").cast("date"),
            (pmod(col("customer_id"), lit(200)) + col("v") * 1200).cast("int")))
            .as("valid_from"))
    }

    // stg_users.sql:1-5 — user↔customer account mapping (synthesized 1:1).
    p.register("stg_users") { _ =>
      Tables.customer(spark, dir).select(
        (col("c_custkey") + 500000).as("user_id"),
        col("c_custkey").as("customer_id"))
    }

    // stg_transactions.sql:52-61 — normalized payment transactions; the
    // order-id normalizer kernel is the gated piece (q16).
    p.register("stg_transactions") { _ =>
      val o = Tables.orders(spark, dir)
      o.select(
        concat(lit("TXN-"), col("o_orderkey")).as("transaction_id"),
        normalizeOrderId(concat(lit("so-"), col("o_orderkey"))).as("order_ref"),
        col("o_orderkey").as("order_id"),
        d6(col("o_totalprice")).as("amount"),
        when(col("o_orderkey") % 4 === 0, "card").when(col("o_orderkey") % 4 === 1, "cash")
          .when(col("o_orderkey") % 4 === 2, "wallet").otherwise("cod")
          .as("payment_method"))
    }

    // stg_items.sql:29-42 — priced items with ex-VAT back-out (q36).
    p.register("stg_items") { _ =>
      Tables.part(spark, dir).select(
        col("p_partkey").as("item_id"), col("p_name").as("item_name"),
        col("p_brand").as("brand"), col("p_type").as("item_type"),
        (col("p_partkey") % 2 === 1).as("has_vat"),
        when(col("p_partkey") % 2 === 1, col("p_retailprice") / lit(1.05d))
          .otherwise(col("p_retailprice")).as("price_ex_vat"))
    }

    // stg_invoices_ar.sql / stg_invoice_payments.sql:17-77 — invoice JSON
    // extraction + paid-only payments (q33 gates the full JSON shape).
    p.register("stg_invoices_ar") { _ =>
      val o = Tables.orders(spark, dir)
      val total = round(col("o_totalprice") * 100).cast("long")
      o.select(
        col("o_orderkey").cast("string").as("invoice_id"),
        col("o_custkey").cast("string").as("customer_id"),
        to_date(col("o_orderdate")).as("invoice_date"),
        (total.cast("double") / 100.0d).as("total_amount"),
        when(col("o_orderkey") % 3 === 0, 0.0d)
          .otherwise((total % 10000).cast("double") / 100.0d).as("balance"))
    }
    p.register("stg_invoice_payments", deps = Seq("stg_invoices_ar")) { d =>
      d("stg_invoices_ar")
        .where(col("total_amount") - col("balance") > 0)
        .select(
          surrogateKey(lit("zoho_invoice"), col("invoice_id"),
            date_format(col("invoice_date"), "yyyy-MM-dd")).as("payment_id"),
          col("invoice_id"), col("customer_id"),
          col("invoice_date").as("payment_date"),
          (col("total_amount") - col("balance")).as("amount_paid"))
    }

    // stg_shipments.sql:13-66 — 13-field shipment extraction with the
    // default-'shipped' decode and keep-latest dedup (q53 gates it).
    p.register("stg_shipments") { _ =>
      val o = Tables.orders(spark, dir)
      val k = col("o_orderkey")
      val status = when(k % 7 === 0, "shipped").when(k % 7 === 1, "in_transit")
        .when(k % 7 === 2, "delivered").when(k % 7 === 3, "failed")
        .when(k % 7 === 4, "returned").otherwise("shipped")
      o.select(
        (k - k % 2).cast("string").as("shipment_id"),
        concat(lit("PKG"), k).as("package_id"),
        status.as("status_canonical"),
        when(k % 5 === 0, null).otherwise(date_add(to_date(col("o_orderdate")), 2))
          .as("shipped_at"),
        to_date(col("o_orderdate")).as("shipment_created_date"),
        col("o_custkey").cast("string").as("customer_id"),
        k.cast("string").as("salesorder_id"))
    }

    // stg_delivery_slots.sql:23-119 — the slot-text parser (q34 gates the
    // kernel; here the distinct parsed catalog).
    p.register("stg_delivery_slots") { _ =>
      val o = Tables.orders(spark, dir)
      val k = col("o_orderkey") % 10
      val txt = when(k === 0, "8am - 10am").when(k === 1, "10:30 - 12:30 PM")
        .when(k === 2, "2  PM – 4  PM").when(k === 3, "Morning 9 - 11")
        .when(k === 4, "evening 6—8").when(k === 5, "18:00–20:00")
        .when(k === 6, "30-60 min").when(k === 7, "12pm - 2pm")
        .when(k === 8, "12am - 1:15am")
      val norm = o.select(txt.as("dt"))
        .where(col("dt").isNotNull && trim(col("dt")) =!= "")
        .select(SlotParser.normalizeSlotText(col("dt")).as("slot_txt")).distinct()
      norm.select(col("slot_txt") +: SlotParser.parse(col("slot_txt")): _*)
        .where(!col("is_duration"))
        .select(surrogateKey(col("delivery_slot")).as("delivery_slot_id"),
          col("slot_txt"), col("delivery_slot"),
          col("start_time"), col("end_time"), col("slot_period"))
    }

    // stg_packages.sql — package-per-shipment rollup.
    p.register("stg_packages", deps = Seq("stg_shipments")) { d =>
      d("stg_shipments").groupBy(col("package_id"))
        .agg(count(lit(1)).as("n_shipments"),
          max(col("shipment_created_date")).as("latest_shipment_date"))
    }

    // stg_product_{brands,categories,details}.sql — part-derived lookups.
    p.register("stg_product_brands") { _ =>
      Tables.part(spark, dir).select(col("p_brand").as("brand")).distinct()
        .select(surrogateKey(col("brand")).as("brand_id"), col("brand"))
    }
    p.register("stg_product_categories") { _ =>
      Tables.part(spark, dir).select(col("p_type").as("category")).distinct()
        .select(surrogateKey(col("category")).as("category_id"), col("category"))
    }
    p.register("stg_product_details") { _ =>
      Tables.part(spark, dir).select(
        col("p_partkey").as("product_id"), col("p_name").as("product_name"),
        col("p_brand").as("brand"), col("p_type").as("category"),
        col("p_size").as("size"), col("p_retailprice").as("retail_price"))
    }

    // ---------------- marts (reference models/marts/commerce/*) -----------

    // dim_customer.sql:1-80 — conformed customer dim with surrogate key.
    p.register("dim_customer", deps = Seq("stg_customers")) { d =>
      d("stg_customers").select(
        surrogateKey(col("customer_id")).as("customer_sk"),
        col("customer_id"), col("full_name"), col("segment"),
        col("nation_id"), col("account_balance"))
    }

    // dim_orders.sql:1-70 — order dim: surrogate key + date parts.
    p.register("dim_orders", deps = Seq("stg_orders")) { d =>
      d("stg_orders").select(
        surrogateKey(col("order_id")).as("order_sk"),
        col("order_id"), col("customer_id"), col("order_date"),
        col("status_canonical"), col("channel"),
        year(col("order_date")).as("order_year"),
        month(col("order_date")).as("order_month"))
    }

    // --------- declared-but-empty dims (reference 0-byte placeholders) ----
    // dims/dim_address.sql (placeholder) — current address per customer:
    // keep-latest over the versioned address book, surrogate-keyed.
    p.register("dim_address", deps = Seq("stg_addresses")) { d =>
      graft.operators.Dedup.keepLatest(d("stg_addresses"),
          Seq(col("customer_id")), col("valid_from"), col("addr_id"))
        .select(surrogateKey(col("addr_id")).as("address_sk"),
          col("addr_id"), col("customer_id"), col("ship_area"),
          col("valid_from"))
    }

    // dims/dim_date.sql (placeholder) — source-less calendar spine over the
    // order-date span; the full calendar-part surface is gated by q66.
    p.register("dim_date") { _ =>
      spark.range(1).select(explode(sequence(
          lit("1992-01-01").cast("date"), lit("1998-12-31").cast("date"),
          expr("interval 1 day"))).as("date_day"))
        .select(surrogateKey(col("date_day")).as("date_sk"), col("date_day"),
          year(col("date_day")).cast("long").as("year"),
          month(col("date_day")).cast("long").as("month"),
          dayofmonth(col("date_day")).cast("long").as("day_of_month"),
          quarter(col("date_day")).cast("long").as("quarter"),
          weekofyear(col("date_day")).cast("long").as("iso_week"),
          dayofweek(col("date_day")).isin(1, 7).as("is_weekend"))
    }

    // dims/dim_delivery_slot.sql (placeholder) — conformed slot dim over
    // the parsed slot catalog (parser gated by q34).
    p.register("dim_delivery_slot", deps = Seq("stg_delivery_slots")) { d =>
      d("stg_delivery_slots").select(
        col("delivery_slot_id").as("delivery_slot_sk"),
        col("delivery_slot"), col("start_time"), col("end_time"),
        col("slot_period"))
    }

    // dims/dim_device.sql (placeholder) — order-channel → device-class
    // conformance map (the synthetic schema carries no UA strings; the
    // channel domain is the device signal the reference models would
    // conform).
    p.register("dim_device", deps = Seq("stg_orders")) { d =>
      d("stg_orders").select(col("channel")).distinct()
        .select(surrogateKey(col("channel")).as("device_sk"), col("channel"),
          when(col("channel") === "web", "desktop")
            .when(col("channel") === "app", "mobile")
            .when(col("channel") === "phone", "callcenter")
            .when(col("channel") === "store", "pos")
            .otherwise("api").as("device_class"))
    }

    // dims/dim_payment_method.sql (placeholder) — distinct method dim off
    // the normalized transactions.
    p.register("dim_payment_method", deps = Seq("stg_transactions")) { d =>
      d("stg_transactions").select(col("payment_method")).distinct()
        .select(surrogateKey(col("payment_method")).as("payment_method_sk"),
          col("payment_method"),
          (col("payment_method") =!= "cod").as("is_prepaid"))
    }

    // dims/dim_product.sql (placeholder) — product dim: details conformed
    // with the brand/category surrogate lookups (all three staging models
    // exist in the reference; the dim is the declared join of them).
    p.register("dim_product",
      deps = Seq("stg_product_details", "stg_product_brands",
        "stg_product_categories")) { d =>
      d("stg_product_details")
        .join(d("stg_product_brands"), Seq("brand"), "left")
        .join(d("stg_product_categories"), Seq("category"), "left")
        .select(surrogateKey(col("product_id")).as("product_sk"),
          col("product_id"), col("product_name"), col("brand"),
          col("brand_id"), col("category"), col("category_id"),
          col("size"), col("retail_price"))
    }

    // dims/dim_promo.sql (placeholder) — promo dim from the distinct
    // non-zero discount levels the line items actually carry.
    p.register("dim_promo", deps = Seq("stg_order_items")) { d =>
      d("stg_order_items")
        .where(col("discount_pct") > 0)
        .select(col("discount_pct"), col("discount_application_type"))
        .distinct()
        .select(
          surrogateKey(col("discount_pct"), col("discount_application_type"))
            .as("promo_sk"),
          concat(lit("PROMO-"), col("discount_application_type"), lit("-"),
            col("discount_pct").cast("string")).as("promo_code"),
          col("discount_pct"), col("discount_application_type"))
    }

    // fct_order_items.sql:80-163 — line money math: PERCENTAGE-gated
    // discount, clamp+round, order-level VAT on net-before-tax (q52).
    p.register("fct_order_items", deps = Seq("stg_order_items", "stg_orders")) { d =>
      val items = d("stg_order_items")
      val ord = d("stg_orders").select(col("order_id"), col("vat_pct"),
        col("created_at_utc"), col("created_at_local"))
      val z = lit(0).cast(D)
      val c100 = lit(100).cast(D)
      val joined = items.join(ord, Seq("order_id"), "left")
      val discEff = d6(clampPct100(
        when(col("discount_application_type") === "PERCENTAGE", col("discount_pct"))
          .otherwise(z)))
      joined
        .withColumn("line_gross", d6(col("quantity") * col("unit_price")))
        .withColumn("disc_frac", d6(discEff / c100))
        .withColumn("line_net_bt",
          d6(col("line_gross") - col("line_gross") * col("disc_frac")))
        .withColumn("line_tax", when(col("has_vat"),
          d6(col("line_net_bt") * d6(col("vat_pct") / c100))).otherwise(z))
        .select(
          surrogateKey(col("order_id"), col("product_id"), col("order_item_id"))
            .as("order_item_sk"),
          col("order_item_id"), col("order_id"), col("product_id"),
          col("created_at_utc"), col("created_at_local"),
          col("line_gross"), col("line_net_bt"), col("line_tax"),
          d6(col("line_net_bt") + col("line_tax")).as("line_net"))
    }

    // fct_orders.sql:1-214 — order rollup + as-of best shipping address +
    // users/transactions joins (the q47 composite).
    p.register("fct_orders",
      deps = Seq("fct_order_items", "stg_addresses", "stg_orders",
        "stg_transactions", "stg_users")) { d =>
      val rollup = d("fct_order_items").groupBy(col("order_id")).agg(
        count(lit(1)).as("item_count"),
        money(sum(col("line_gross"))).as("order_gross"),
        money(sum(col("line_net_bt"))).as("order_net_before_tax"),
        money(sum(col("line_tax"))).as("order_tax"),
        money(sum(col("line_net"))).as("order_net"))
      val base = d("stg_orders")
        .join(rollup, Seq("order_id"), "left")
        .join(d("stg_transactions").select(col("order_id"), col("payment_method")),
          Seq("order_id"), "left")
        .join(d("stg_users"), Seq("customer_id"), "left")
      val withAddr = AsOfJoin.bestAtTime(
        base.select(col("order_id"), col("customer_id"), col("created_at_utc")),
        d("stg_addresses"), Seq("customer_id"),
        leftTs = col("created_at_utc"), rightTs = col("valid_from"),
        tiebreakCol = "addr_id")
        .select(col("order_id"), col("ship_area"), col("addr_id").as("ship_addr_id"))
      base.join(withAddr, Seq("order_id"), "left")
        .select(surrogateKey(col("order_id")).as("order_sk"),
          col("order_id"), col("customer_id"), col("user_id"),
          col("order_date"), col("status_canonical"), col("channel"),
          col("payment_method"), col("item_count"),
          col("order_gross"), col("order_net_before_tax"),
          col("order_tax"), col("order_net"),
          col("ship_area"), col("ship_addr_id"))
    }

    // fct_orders_revenue.sql:1-25 — per-order recognized revenue. (The
    // reference prices via stg_items; in this schema line prices live on
    // stg_order_items, so the edge set adds it — noted divergence.)
    p.register("fct_orders_revenue",
      deps = Seq("stg_orders", "stg_order_items")) { d =>
      val rev = d("stg_order_items").groupBy(col("order_id"))
        .agg(money(sum(d6(col("quantity") * col("unit_price")))).as("revenue"))
      d("stg_orders")
        .select(col("order_id"), col("customer_id"), col("order_date"), col("channel"))
        .join(rev, Seq("order_id"), "left")
        .withColumn("revenue", coalesce(col("revenue"), lit(0).cast(Money)))
    }

    // fct_customer_monthly_revenue.sql:1-30 — calendar-month rollup with
    // the month-boundary datediff kernel (q05/q17).
    p.register("fct_customer_monthly_revenue", deps = Seq("fct_orders_revenue")) { d =>
      d("fct_orders_revenue")
        .groupBy(col("customer_id"), trunc(col("order_date"), "month").as("month_start"))
        .agg(count(lit(1)).as("n_orders"), money(sum(col("revenue"))).as("month_revenue"))
    }

    // customer_revenue_ltv.sql:1-40 — first-order anchor + horizon sums
    // (q06's single-pass shape).
    p.register("customer_revenue_ltv",
      deps = Seq("fct_customer_monthly_revenue", "fct_orders_revenue")) { d =>
      val first = d("fct_orders_revenue").groupBy(col("customer_id"))
        .agg(min(col("order_date")).as("first_order_date"))
      val monthly = d("fct_customer_monthly_revenue")
      monthly.join(first, Seq("customer_id"))
        .withColumn("month_index",
          monthsBetweenCalendar(col("month_start"), col("first_order_date")))
        .groupBy(col("customer_id"), col("first_order_date"))
        .agg(
          money(sum(when(col("month_index") < 3, col("month_revenue")))).as("ltv_3m"),
          money(sum(when(col("month_index") < 6, col("month_revenue")))).as("ltv_6m"),
          money(sum(when(col("month_index") < 12, col("month_revenue")))).as("ltv_12m"),
          money(sum(col("month_revenue"))).as("ltv_total"))
    }

    // cohort_revenue_ltv.sql:1-25 — LTV stats by first-order cohort month.
    p.register("cohort_revenue_ltv", deps = Seq("customer_revenue_ltv")) { d =>
      d("customer_revenue_ltv")
        .groupBy(trunc(col("first_order_date"), "month").as("cohort_month"))
        .agg(count(lit(1)).as("n_customers"),
          money(sum(col("ltv_3m"))).as("cohort_ltv_3m"),
          money(sum(col("ltv_12m"))).as("cohort_ltv_12m"))
    }

    // first_channel_ltv.sql:1-30 — first-order channel pick (window) ×
    // LTV rollup (q08's shape).
    p.register("first_channel_ltv",
      deps = Seq("customer_revenue_ltv", "stg_orders")) { d =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("customer_id"))
        .orderBy(col("created_at_utc"), col("order_id"))
      val firstChannel = d("stg_orders")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("customer_id"), col("channel").as("first_channel"))
      d("customer_revenue_ltv").join(firstChannel, Seq("customer_id"))
        .groupBy(col("first_channel"))
        .agg(count(lit(1)).as("n_customers"),
          money(sum(col("ltv_12m"))).as("channel_ltv_12m"))
    }

    // fct_customers.sql:1-40 — one row per customer from the order facts.
    p.register("fct_customers", deps = Seq("dim_orders", "fct_orders")) { d =>
      d("fct_orders").groupBy(col("customer_id")).agg(
        count(lit(1)).as("lifetime_orders"),
        money(sum(col("order_net"))).as("lifetime_net"),
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("latest_order_date"))
        .join(d("dim_orders").groupBy(col("customer_id"))
          .agg(countDistinct(col("channel")).as("n_channels")),
          Seq("customer_id"), "left")
    }

    // ------ declared-but-empty aggregates (reference 0-byte placeholders) --
    // aggregates/agg_orders_daily.sql (placeholder) — the first ask of any
    // commerce mart: daily order counts, distinct buyers and money totals
    // off fct_orders. The distinct-buyer count runs as a separate
    // pre-deduped aggregate joined back on order_date: mixing distinct
    // and plain aggregates plans through Expand, doubling the aggregate
    // input (the round-2 q46 cliff). Both aggregates and the join share
    // the order_date hash partitioning — one logical shuffle family.
    p.register("agg_orders_daily", deps = Seq("fct_orders")) { d =>
      val f = d("fct_orders")
      val sums = f.groupBy(col("order_date")).agg(
        count(lit(1)).as("n_orders"),
        money(sum(col("order_gross"))).as("day_gross"),
        money(sum(col("order_tax"))).as("day_tax"),
        money(sum(col("order_net"))).as("day_net"))
      val buyers = f.select(col("order_date"), col("customer_id")).distinct()
        .groupBy(col("order_date")).agg(count(lit(1)).as("n_customers"))
      sums.join(buyers, Seq("order_date"))
        .select(col("order_date"), col("n_orders"), col("n_customers"),
          col("day_gross"), col("day_tax"), col("day_net"))
    }

    // aggregates/agg_items_daily.sql (placeholder) — daily line-item
    // volume and money totals off fct_order_items, distinct-order count
    // split the same way.
    p.register("agg_items_daily", deps = Seq("fct_order_items")) { d =>
      val f = d("fct_order_items")
        .withColumn("order_date", to_date(col("created_at_utc")))
      val sums = f.groupBy(col("order_date")).agg(
        count(lit(1)).as("n_line_items"),
        money(sum(col("line_gross"))).as("day_line_gross"),
        money(sum(col("line_net"))).as("day_line_net"))
      val ords = f.select(col("order_date"), col("order_id")).distinct()
        .groupBy(col("order_date")).agg(count(lit(1)).as("n_orders"))
      sums.join(ords, Seq("order_date"))
        .select(col("order_date"), col("n_line_items"), col("n_orders"),
          col("day_line_gross"), col("day_line_net"))
    }

    p
  }
}
