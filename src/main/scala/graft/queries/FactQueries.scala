package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.operators.AsOfJoin
import graft.sources.Tables

/** q47: the reference's flagship fact model end-to-end (reference
  * models/marts/commerce/facts/fct_orders.sql:1-214) — line-level exact
  * decimal math → order rollup (counts, distinct products, coalesced
  * sums, net-before-tax) → VAT/customer joins → best-shipping-address
  * at order time (the as-of operator) → derived percentages → surrogate
  * keys and date parts. One query composing every operator family the
  * model touches; a user of the reference's fct_orders gets the same
  * shape here.
  *
  * Derived percentages are emitted as raw doubles (one deterministic
  * division) rather than round(x,2): double rounding is
  * representation-dependent across engines while the division itself is
  * bit-stable; money sums keep the reference's round-to-2 (exact
  * decimal rounding, identical on both engines).
  */
object FactQueries {

  private val zero6 = lit(0).cast(DecimalType(18, 6))

  val defs: Seq[QueryDef] = Seq(

    // q52: the reference's LINE-level money path (reference
    // models/marts/commerce/facts/fct_order_items.sql:80-127) — the part
    // q47's order rollup does not cover: an effective discount stacked from
    // THREE sources (item, friendbuy, bulk), where percentage inputs count
    // only when their application type is 'PERCENTAGE' (:84-86), the
    // stacked sum is clamped to [0,100] THEN rounded to 2 (:97-105), and
    // the ORDER-level vat_percentage (joined from orders, :46-52,71) is
    // applied to net-before-tax only when the line has_vat (:107,125).
    // Discount sources/types are synthesized deterministically from keys so
    // both engines build identical inputs; the math below keeps the
    // reference's exact cast discipline (every step lands back in the one
    // decimal domain before the next).
    QueryDef(
      "q52_order_item_money",
      (s, dir) => {
        val D = DecimalType(18, 6)
        def d(c: org.apache.spark.sql.Column) = c.cast(D)
        val z    = lit(0).cast(D)
        val c100 = lit(100).cast(D)

        // The money chain below is per-row decimal work over every line
        // item; the single sf-file scan under-splits (3 tasks at
        // local[32]), serializing it — and the final total-order sort's
        // range-sampling pass executes the child twice. Fan the scan out
        // to every core first (no-op on a well-split deployment).
        val li = graft.operators.Skew.fanOutRead(Tables.lineitem(s, dir))
        val o  = Tables.orders(s, dir)

        // ---- items (:14-43): raw inputs + application types ----
        val items = li.select(
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("order_item_id"),
          col("l_orderkey").as("order_id"),
          col("l_partkey").as("product_id"),
          d(col("l_quantity")).as("qty"),
          d(col("l_extendedprice")).as("price"),
          // reference: has_vat_raw in (1,'1','true','TRUE') → boolean (:61)
          when(col("l_partkey") % 4 === 0, "1").when(col("l_partkey") % 4 === 1, "true")
            .when(col("l_partkey") % 4 === 2, "0").otherwise("false").as("has_vat_raw"),
          // three discount sources; item discount nullable (coalesce→0, :67)
          when(col("l_suppkey") % 11 === 0, null)
            .otherwise(d(col("l_discount") * 100)).as("disc_in_raw"),
          d((col("l_orderkey") % 7) - 3).as("friendbuy_in_raw"),
          d((col("l_partkey") % 5) * 30).as("bulk_in_raw"),
          // application types: null → 'PERCENTAGE', lowercase → upper (:32,35)
          upper(coalesce(
            when(col("l_linenumber") % 3 === 0, "PERCENTAGE")
              .when(col("l_linenumber") % 3 === 1, "amount"),
            lit("PERCENTAGE"))).as("discount_application_type"),
          upper(when(col("l_orderkey") % 2 === 0, "percentage")
            .otherwise("AMOUNT")).as("friendbuy_discount_application_type"))

        // ---- orders join: ORDER-level VAT percentage (:46-52,71) ----
        val ord = o.select(col("o_orderkey").as("order_id"),
          col("o_orderdate").as("created_at_utc"),
          when(col("o_orderkey") % 13 === 0, null)
            .otherwise(d((col("o_orderkey") % 3) * 5)).as("vat_pct_raw"))
        val typed = items.join(ord, Seq("order_id"), "left")
          .withColumn("has_vat", col("has_vat_raw").isin("1", "true", "TRUE"))
          .withColumn("disc_in", coalesce(col("disc_in_raw"), z))
          .withColumn("friendbuy_in", coalesce(col("friendbuy_in_raw"), z))
          .withColumn("bulk_in", coalesce(col("bulk_in_raw"), z))
          .withColumn("vat_pct", coalesce(col("vat_pct_raw"), z))

        // ---- percentage-type gating (:84-86) ----
        val pct = typed
          .withColumn("disc_pct",
            when(col("discount_application_type") === "PERCENTAGE", col("disc_in")).otherwise(z))
          .withColumn("friendbuy_pct",
            when(col("friendbuy_discount_application_type") === "PERCENTAGE",
              col("friendbuy_in")).otherwise(z))
          .withColumn("bulk_pct", col("bulk_in"))

        // ---- amounts (:91-108): clamp BEFORE round, vat fraction ----
        val discSum = col("disc_pct") + col("friendbuy_pct") + col("bulk_pct")
        val amt = pct
          .withColumn("line_gross", d(col("qty") * col("price")))
          .withColumn("disc_pct_eff",
            d(when(discSum < z, z).when(discSum > c100, c100).otherwise(round(discSum, 2))))
          .withColumn("vat_frac", d(col("vat_pct") / c100))

        // ---- two-step line math (:112-126): net-before-tax from the
        // UNROUNDED product, tax only when has_vat ----
        val math = amt
          .withColumn("disc_frac", d(col("disc_pct_eff") / c100))
          .withColumn("line_net_bt", d(col("line_gross") - col("line_gross") * col("disc_frac")))
          .withColumn("line_discount", d(col("line_gross") * col("disc_frac")))
          .withColumn("line_tax",
            when(col("has_vat"), d(col("line_net_bt") * col("vat_frac"))).otherwise(z))

        // ---- final projection (:129-163): SKs, rounded money outputs ----
        math.select(
            surrogateKey(col("order_id"), col("product_id"), col("order_item_id")).as("order_item_sk"),
            surrogateKey(col("order_id")).as("order_sk"),
            col("order_item_id"), col("order_id"), col("product_id"),
            to_date(col("created_at_utc")).as("order_date"),
            col("has_vat"),
            moneyOut(round(col("qty"), 2)).as("quantity"),
            moneyOut(round(col("price"), 2)).as("unit_price"),
            moneyOut(round(col("line_gross"), 2)).as("line_gross"),
            moneyOut(round(col("disc_pct_eff"), 2)).as("discount_pct_effective"),
            moneyOut(round(col("line_discount"), 2)).as("line_discount_amt"),
            moneyOut(round(col("vat_pct"), 2)).as("vat_pct"),
            moneyOut(round(col("line_tax"), 2)).as("line_tax_amt"),
            moneyOut(round(col("line_net_bt") + col("line_tax"), 2)).as("line_net_amt"))
          // the synthetic lineitem contains duplicate (orderkey, linenumber)
          // rows (q11's dup corpus) — order_item_id alone is not a total
          // order, so tiebreak on the columns dup rows differ in
          .orderBy(col("order_item_id"), col("product_id"),
            col("line_net_amt"), col("line_discount_amt"), col("quantity"))
      },
      Some("""
        WITH items AS (
          SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS order_item_id,
                 l_orderkey AS order_id, l_partkey AS product_id,
                 CAST(l_quantity AS DECIMAL(18,6)) AS qty,
                 CAST(l_extendedprice AS DECIMAL(18,6)) AS price,
                 CASE l_partkey % 4 WHEN 0 THEN '1' WHEN 1 THEN 'true'
                                    WHEN 2 THEN '0' ELSE 'false' END AS has_vat_raw,
                 CASE WHEN l_suppkey % 11 = 0 THEN NULL
                      ELSE CAST(l_discount * 100 AS DECIMAL(18,6)) END AS disc_in_raw,
                 CAST((l_orderkey % 7) - 3 AS DECIMAL(18,6)) AS friendbuy_in_raw,
                 CAST((l_partkey % 5) * 30 AS DECIMAL(18,6)) AS bulk_in_raw,
                 upper(COALESCE(CASE l_linenumber % 3 WHEN 0 THEN 'PERCENTAGE'
                                                      WHEN 1 THEN 'amount' END,
                                'PERCENTAGE')) AS discount_application_type,
                 upper(CASE WHEN l_orderkey % 2 = 0 THEN 'percentage'
                            ELSE 'AMOUNT' END) AS friendbuy_discount_application_type
          FROM lineitem),
        ord AS (
          SELECT o_orderkey AS order_id, o_orderdate AS created_at_utc,
                 CASE WHEN o_orderkey % 13 = 0 THEN NULL
                      ELSE CAST((o_orderkey % 3) * 5 AS DECIMAL(18,6)) END AS vat_pct_raw
          FROM orders),
        typed AS (
          SELECT i.*, o.created_at_utc,
                 (i.has_vat_raw IN ('1','true','TRUE')) AS has_vat,
                 COALESCE(i.disc_in_raw,      CAST(0 AS DECIMAL(18,6))) AS disc_in,
                 COALESCE(i.friendbuy_in_raw, CAST(0 AS DECIMAL(18,6))) AS friendbuy_in,
                 COALESCE(i.bulk_in_raw,      CAST(0 AS DECIMAL(18,6))) AS bulk_in,
                 COALESCE(o.vat_pct_raw,      CAST(0 AS DECIMAL(18,6))) AS vat_pct
          FROM items i LEFT JOIN ord o USING (order_id)),
        pct AS (
          SELECT t.*,
                 CASE WHEN t.discount_application_type = 'PERCENTAGE'
                      THEN t.disc_in ELSE CAST(0 AS DECIMAL(18,6)) END AS disc_pct,
                 CASE WHEN t.friendbuy_discount_application_type = 'PERCENTAGE'
                      THEN t.friendbuy_in ELSE CAST(0 AS DECIMAL(18,6)) END AS friendbuy_pct,
                 t.bulk_in AS bulk_pct
          FROM typed t),
        amt AS (
          SELECT p.*,
                 -- DuckDB decimal multiply keeps max operand WIDTH (scale
                 -- adds): (18,6)*(18,6)->(18,12) overflows at 10^6, so the
                 -- left operand widens to (28,6) -> exact (38,12) product
                 CAST(CAST(p.qty AS DECIMAL(28,6)) * p.price AS DECIMAL(18,6)) AS line_gross,
                 CAST(CASE WHEN p.disc_pct + p.friendbuy_pct + p.bulk_pct < 0 THEN 0
                           WHEN p.disc_pct + p.friendbuy_pct + p.bulk_pct > 100 THEN 100
                           ELSE round(p.disc_pct + p.friendbuy_pct + p.bulk_pct, 2)
                      END AS DECIMAL(18,6)) AS disc_pct_eff,
                 CAST(p.vat_pct / 100 AS DECIMAL(18,6)) AS vat_frac
          FROM pct p),
        math1 AS (
          SELECT a.*,
                 CAST(a.disc_pct_eff / 100 AS DECIMAL(18,6)) AS disc_frac
          FROM amt a),
        math2 AS (
          SELECT m.*,
                 CAST(m.line_gross - CAST(m.line_gross AS DECIMAL(28,6)) * m.disc_frac AS DECIMAL(18,6)) AS line_net_bt,
                 CAST(CAST(m.line_gross AS DECIMAL(28,6)) * m.disc_frac AS DECIMAL(18,6)) AS line_discount
          FROM math1 m),
        math AS (
          SELECT m2.*,
                 CASE WHEN m2.has_vat
                      THEN CAST(CAST(m2.line_net_bt AS DECIMAL(28,6)) * m2.vat_frac AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END AS line_tax
          FROM math2 m2)
        SELECT md5(COALESCE(CAST(order_id AS VARCHAR), '_dbt_utils_surrogate_key_null_') || '-' ||
                   COALESCE(CAST(product_id AS VARCHAR), '_dbt_utils_surrogate_key_null_') || '-' ||
                   COALESCE(CAST(order_item_id AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS order_item_sk,
               md5(COALESCE(CAST(order_id AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS order_sk,
               order_item_id, order_id, product_id,
               CAST(created_at_utc AS DATE) AS order_date,
               has_vat,
               CAST(CAST(round(qty, 2) AS DECIMAL(38,6)) AS DOUBLE) AS quantity,
               CAST(CAST(round(price, 2) AS DECIMAL(38,6)) AS DOUBLE) AS unit_price,
               CAST(CAST(round(line_gross, 2) AS DECIMAL(38,6)) AS DOUBLE) AS line_gross,
               CAST(CAST(round(disc_pct_eff, 2) AS DECIMAL(38,6)) AS DOUBLE) AS discount_pct_effective,
               CAST(CAST(round(line_discount, 2) AS DECIMAL(38,6)) AS DOUBLE) AS line_discount_amt,
               CAST(CAST(round(vat_pct, 2) AS DECIMAL(38,6)) AS DOUBLE) AS vat_pct,
               CAST(CAST(round(line_tax, 2) AS DECIMAL(38,6)) AS DOUBLE) AS line_tax_amt,
               CAST(CAST(round(line_net_bt + line_tax, 2) AS DECIMAL(38,6)) AS DOUBLE) AS line_net_amt
        FROM math
        ORDER BY order_item_id, product_id, line_net_amt, line_discount_amt, quantity""")),
    QueryDef(
      "q47_fct_orders",
      (s, dir) => {
        // q47 rides the same line-level decimal math as q52 — fan the
        // under-split lineitem scan out to every core (no-op at scale)
        val li = graft.operators.Skew.fanOutRead(Tables.lineitem(s, dir))
        val o  = Tables.orders(s, dir)
        val c  = Tables.customer(s, dir)

        // ---- line math (fct_order_items analog, :8-26) ----
        val gross     = dec6(col("l_extendedprice"))
        val discAmt   = (gross * dec6(col("l_discount"))).cast(DecimalType(18, 6))
        val afterDisc = (gross - discAmt).cast(DecimalType(18, 6))
        val taxAmt    = (afterDisc * dec6(col("l_tax"))).cast(DecimalType(18, 6))
        val net       = (afterDisc + taxAmt).cast(DecimalType(18, 6))
        val lines = li.select(col("l_orderkey").as("order_id"),
          col("l_partkey"), gross.as("line_gross"), discAmt.as("line_discount"),
          taxAmt.as("line_tax"), net.as("line_net"))

        // ---- order rollup (:29-43) ----
        // distinct-count split from the sums: mixing DISTINCT and plain
        // aggregates in one agg() doubles the input through an Expand
        // node (same lesson as q46); two hash aggs + a same-key join is
        // cheaper and the join needs no extra shuffle (same key).
        val sums = lines.groupBy(col("order_id")).agg(
          count(lit(1)).as("item_count"),
          money(sum(coalesce(col("line_gross"), zero6))).as("order_gross"),
          money(sum(coalesce(col("line_discount"), zero6))).as("order_discount"),
          money(sum(coalesce(col("line_tax"), zero6))).as("order_tax"),
          money(sum(coalesce(col("line_net"), zero6))).as("order_net"))
        val dp = lines.groupBy(col("order_id"))
          .agg(countDistinct(col("l_partkey")).as("distinct_products"))
        val agg = sums.join(dp, Seq("order_id"))
          .withColumn("order_net_bt", (col("order_net") - col("order_tax")).cast(Money))

        // ---- orders (VAT source) + canonical customer (:46-74) ----
        val ordSrc = o.select(col("o_orderkey").as("order_id"),
          col("o_orderdate").as("created_at_utc"),
          dec6((col("o_orderkey") % 3) * 5).as("vat_pct_src"),
          col("o_custkey").as("customer_id"))
        val joined = agg.join(ordSrc, Seq("order_id"), "left")

        // ---- synthetic two-version address book + as-of pick (:82-141) ----
        val addr = c.select(col("c_custkey").as("customer_id"),
            col("c_mktsegment").as("segment"),
            explode(array(lit(0), lit(1))).as("v"))
          .select(col("customer_id"),
            concat(col("segment"), lit("#v"), col("v")).as("ship_area"),
            (col("customer_id") * 2 + col("v")).as("addr_id"),
            to_timestamp(date_add(lit("1993-01-01").cast("date"),
              (pmod(col("customer_id"), lit(200)) + col("v") * 1200).cast("int"))).as("addr_ts"))
        val orderBase = joined.select(col("order_id"), col("customer_id"),
          col("created_at_utc"))
        val withAddr = AsOfJoin.bestAtTime(
          orderBase, addr, Seq("customer_id"),
          leftTs = col("created_at_utc"), rightTs = col("addr_ts"),
          tiebreakCol = "addr_id")
          .select(col("order_id"), col("ship_area"), col("addr_id").as("ship_addr_id"))

        // ---- derived percentages (:144-160) + final (:162-213) ----
        joined.join(withAddr, Seq("order_id"), "left")
          .select(
            surrogateKey(col("order_id")).as("order_sk"),
            col("order_id"), col("customer_id"),
            to_date(col("created_at_utc")).as("order_date"),
            col("item_count"), col("distinct_products"),
            moneyOut(round(col("order_gross"), 2)).as("order_gross"),
            moneyOut(round(col("order_discount"), 2)).as("order_discount_amt"),
            moneyOut(round(col("order_net_bt"), 2)).as("order_net_before_tax"),
            moneyOut(round(col("order_tax"), 2)).as("order_tax_amt"),
            moneyOut(round(col("order_net"), 2)).as("order_net_amt"),
            when(col("order_gross") === 0, 0.0d)
              .otherwise(col("order_discount").cast("double") / col("order_gross").cast("double") * 100)
              .as("order_discount_pct_effective"),
            when(col("order_net_bt") === 0, 0.0d)
              .otherwise(col("order_tax").cast("double") / col("order_net_bt").cast("double") * 100)
              .as("order_vat_pct_effective"),
            moneyOut(col("vat_pct_src")).as("vat_pct_src"),
            col("ship_area"), col("ship_addr_id"))
          .orderBy(col("order_id"))
      },
      Some("""
        WITH lines AS (
          SELECT l_orderkey AS order_id, l_partkey,
                 CAST(l_extendedprice AS DECIMAL(18,6)) AS line_gross,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS line_discount,
                 CAST(l_tax AS DECIMAL(18,6)) AS tax_frac
          FROM lineitem),
        lines2 AS (
          SELECT *, CAST(line_gross - line_discount AS DECIMAL(18,6)) AS after_disc FROM lines),
        lines3 AS (
          SELECT order_id, l_partkey, line_gross, line_discount,
                 CAST(after_disc * tax_frac AS DECIMAL(18,6)) AS line_tax,
                 CAST(after_disc + CAST(after_disc * tax_frac AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS line_net
          FROM lines2),
        agg AS (
          SELECT order_id, COUNT(*) AS item_count,
                 COUNT(DISTINCT l_partkey) AS distinct_products,
                 CAST(SUM(COALESCE(line_gross, CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS order_gross,
                 CAST(SUM(COALESCE(line_discount, CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS order_discount,
                 CAST(SUM(COALESCE(line_tax, CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS order_tax,
                 CAST(SUM(COALESCE(line_net, CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS order_net
          FROM lines3 GROUP BY 1),
        agg2 AS (SELECT *, CAST(order_net - order_tax AS DECIMAL(38,6)) AS order_net_bt FROM agg),
        joined AS (
          SELECT a.*, o.o_orderdate AS created_at_utc,
                 CAST((o.o_orderkey % 3) * 5 AS DECIMAL(18,6)) AS vat_pct_src,
                 o.o_custkey AS customer_id
          FROM agg2 a LEFT JOIN orders o ON o.o_orderkey = a.order_id),
        addr AS (
          SELECT c_custkey AS customer_id,
                 c_mktsegment || '#v' || v AS ship_area,
                 c_custkey * 2 + v AS addr_id,
                 CAST(DATE '1993-01-01' + ((c_custkey % 200) + v * 1200) * INTERVAL 1 DAY AS TIMESTAMP) AS addr_ts
          FROM customer, (SELECT unnest([0, 1]) AS v)),
        picked AS (
          SELECT order_id, ship_area, addr_id AS ship_addr_id FROM (
            SELECT ob.order_id, au.ship_area, au.addr_id,
                   row_number() OVER (PARTITION BY ob.order_id ORDER BY
                     CASE WHEN au.addr_ts <= ob.created_at_utc THEN 0 ELSE 1 END,
                     abs(epoch_us(au.addr_ts) - epoch_us(ob.created_at_utc)), au.addr_id) AS rn
            FROM joined ob LEFT JOIN addr au ON au.customer_id = ob.customer_id) t
          WHERE rn = 1)
        SELECT md5(COALESCE(CAST(j.order_id AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS order_sk,
               j.order_id, j.customer_id,
               CAST(j.created_at_utc AS DATE) AS order_date,
               j.item_count, j.distinct_products,
               CAST(round(j.order_gross, 2) AS DOUBLE) AS order_gross,
               CAST(round(j.order_discount, 2) AS DOUBLE) AS order_discount_amt,
               CAST(round(j.order_net_bt, 2) AS DOUBLE) AS order_net_before_tax,
               CAST(round(j.order_tax, 2) AS DOUBLE) AS order_tax_amt,
               CAST(round(j.order_net, 2) AS DOUBLE) AS order_net_amt,
               CASE WHEN j.order_gross = 0 THEN 0.0
                    ELSE j.order_discount::DOUBLE / j.order_gross::DOUBLE * 100 END AS order_discount_pct_effective,
               CASE WHEN j.order_net_bt = 0 THEN 0.0
                    ELSE j.order_tax::DOUBLE / j.order_net_bt::DOUBLE * 100 END AS order_vat_pct_effective,
               CAST(CAST(j.vat_pct_src AS DECIMAL(38,6)) AS DOUBLE) AS vat_pct_src,
               p.ship_area, p.ship_addr_id
        FROM joined j LEFT JOIN picked p ON p.order_id = j.order_id
        ORDER BY j.order_id""")),

    // Exact largest-remainder proration: spread each order's header
    // total over its lines proportionally to line price, IN CENTS, with
    // floor division and the remainder distributed to the lines with the
    // largest fractional part (linenumber tiebreak) — the classic
    // finance allocation where naive per-line rounding leaks cents. All
    // arithmetic is BIGINT (target*weight <= ~1e15); the gate pins that
    // EVERY order reallocates exactly (min boolean), plus value and
    // position-weighted checksums. Duplicate lineitem rows (the q11 dup
    // corpus) tie on (rem, linenumber, w) with identical multipliers, so
    // which twin takes the +1 cent cannot move any emitted aggregate.
    // One exchange on the order key shared by both windows.
    QueryDef(
      "q160_exact_proration",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
          col("l_linenumber"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("w"))
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("target"))
        val wOrd = Window.partitionBy(col("l_orderkey"))
        val wRank = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("rem").desc, col("l_linenumber"), col("w"))
        val alloc = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("tw", sum(col("w")).over(wOrd))
          .withColumn("base", expr("target * w DIV tw"))
          .withColumn("rem", expr("(target * w) % tw"))
          .withColumn("shortfall", col("target") - sum(col("base")).over(wOrd))
          .withColumn("rk", row_number().over(wRank))
          .withColumn("alloc",
            col("base") + when(col("rk") <= col("shortfall"), 1L).otherwise(0L))
        val perOrder = alloc.groupBy(col("l_orderkey"), col("target"))
          .agg(sum(col("alloc")).as("allocated"), count(lit(1)).as("n_lines"),
            sum(col("alloc") * col("l_linenumber")).as("pos_checksum"))
        perOrder.agg(
            count(lit(1)).as("n_orders"), sum(col("n_lines")).as("n_lines"),
            min(col("allocated") === col("target")).as("all_exact"),
            sum(col("allocated")).as("alloc_sum"),
            sum(col("pos_checksum")).as("pos_checksum"))
          .orderBy(col("n_orders"))
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
          FROM lineitem),
        o AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS target
          FROM orders),
        j AS (
          SELECT li.*, o.target,
                 SUM(w) OVER (PARTITION BY l_orderkey) AS tw
          FROM li JOIN o ON l_orderkey = o_orderkey),
        based AS (
          SELECT *, (target * w) // tw AS base, (target * w) % tw AS rem
          FROM j),
        ranked AS (
          SELECT *,
                 target - SUM(base) OVER (PARTITION BY l_orderkey) AS shortfall,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY rem DESC, l_linenumber, w) AS rk
          FROM based),
        alloc AS (
          SELECT l_orderkey, target, l_linenumber,
                 base + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END AS alloc
          FROM ranked),
        per_order AS (
          SELECT l_orderkey, target, SUM(alloc) AS allocated,
                 COUNT(*) AS n_lines,
                 SUM(alloc * l_linenumber) AS pos_checksum
          FROM alloc GROUP BY 1, 2)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(n_lines) AS BIGINT) AS n_lines,
               MIN(allocated = target) AS all_exact,
               CAST(SUM(allocated) AS BIGINT) AS alloc_sum,
               CAST(SUM(pos_checksum) AS BIGINT) AS pos_checksum
        FROM per_order
        ORDER BY n_orders""")),

    // Accumulating-snapshot fact — the Kimball pattern for processes
    // with milestones (ordered → first shipment → final shipment): ONE
    // row per order carrying every milestone date plus the lags between
    // them, re-written as the process advances (here built in one pass:
    // milestone picks are min/max partial aggs over lineitem, lags are
    // exact day integers). The monthly rollup gates milestone coverage
    // (orders with no shipments stay visible with null-safe zero lags)
    // and the exact average lags as ppm-days. Scale: one lineitem
    // partial agg + one broadcast-sized month frame — the accumulating
    // snapshot is exactly the shape that AVOIDS re-scanning history at
    // 100 TB (milestones update in place keyed by order).
    QueryDef(
      "q260_accumulating_snapshot",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
        val ship = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(min(col("l_shipdate").cast("date")).as("first_ship"),
            max(col("l_shipdate").cast("date")).as("last_ship"),
            count(lit(1)).as("n_lines"))
        val snap = o.join(ship, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"), col("od"),
            (year(col("od")) * 100 + month(col("od"))).cast("long").as("ym"),
            coalesce(datediff(col("first_ship"), col("od")), lit(0))
              .cast("long").as("days_to_first"),
            coalesce(datediff(col("last_ship"), col("od")), lit(0))
              .cast("long").as("days_to_complete"),
            when(col("first_ship").isNull, 0L).otherwise(1L).as("has_ship"),
            coalesce(col("n_lines"), lit(0L)).as("n_lines"))
        snap.groupBy(col("ym"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("has_ship")).as("n_shipped"),
            sum(col("n_lines")).as("n_lines"),
            expr("CAST((1000000 * SUM(days_to_first)) div SUM(has_ship) AS BIGINT)")
              .as("avg_days_to_first_ppm"),
            expr("CAST((1000000 * SUM(days_to_complete)) div SUM(has_ship) AS BIGINT)")
              .as("avg_days_to_complete_ppm"))
          .orderBy(col("ym"))
      },
      Some("""
        WITH ship AS (
          SELECT l_orderkey,
                 MIN(CAST(l_shipdate AS DATE)) AS first_ship,
                 MAX(CAST(l_shipdate AS DATE)) AS last_ship,
                 CAST(COUNT(*) AS BIGINT) AS n_lines
          FROM lineitem GROUP BY 1),
        snap AS (
          SELECT o.o_orderkey,
                 CAST(YEAR(CAST(o.o_orderdate AS DATE))*100
                      + MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS ym,
                 COALESCE(date_diff('day', CAST(o.o_orderdate AS DATE), s.first_ship), 0)
                   AS days_to_first,
                 COALESCE(date_diff('day', CAST(o.o_orderdate AS DATE), s.last_ship), 0)
                   AS days_to_complete,
                 CASE WHEN s.first_ship IS NULL THEN 0 ELSE 1 END AS has_ship,
                 COALESCE(s.n_lines, 0) AS n_lines
          FROM orders o LEFT JOIN ship s ON o.o_orderkey = s.l_orderkey)
        SELECT ym,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(has_ship) AS BIGINT) AS n_shipped,
               CAST(SUM(n_lines) AS BIGINT) AS n_lines,
               CAST((1000000 * SUM(days_to_first)) // SUM(has_ship) AS BIGINT)
                 AS avg_days_to_first_ppm,
               CAST((1000000 * SUM(days_to_complete)) // SUM(has_ship) AS BIGINT)
                 AS avg_days_to_complete_ppm
        FROM snap
        GROUP BY ym
        ORDER BY ym""")),

    // Semi-additive balance measures — the fact-modeling rule additive
    // rollups silently violate: a BALANCE sums across ACCOUNTS but NOT
    // across TIME (summing a month's daily balances overstates 30×).
    // Build per-customer running balances from signed order flows
    // (orders add, every 3rd key's orders debit), snapshot the LAST
    // balance per (customer, month) via max_by over the (date, key)
    // total order, then aggregate the month frame ACROSS customers only
    // (sum + ppm average). The month spine is each customer's OBSERVED
    // months — carrying balances through silent months is q97's LOCF
    // gap-fill, composable downstream. One customer exchange carries
    // the running-sum window and the month snapshot; the cross-account
    // rollup partial-aggregates.
    QueryDef(
      "q261_semiadditive_balance",
      (s, dir) => {
        val flows = Tables.orders(s, dir).select(
          col("o_custkey").as("ck"), col("o_orderdate").cast("date").as("d"),
          col("o_orderkey").as("ok"),
          when(col("o_orderkey") % 3 === 0,
            -(col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long"))
            .otherwise((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long")).as("delta"))
        val w = Window.partitionBy(col("ck")).orderBy(col("d"), col("ok"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val bal = flows.withColumn("balance", sum(col("delta")).over(w))
          .withColumn("ym", (year(col("d")) * 100 + month(col("d"))).cast("long"))
        val monthEnd = bal.groupBy(col("ck"), col("ym"))
          .agg(max_by(col("balance"), struct(col("d"), col("ok")))
            .as("eom_balance"))
        monthEnd.groupBy(col("ym"))
          .agg(count(lit(1)).as("n_accounts"),
            sum(col("eom_balance")).as("total_eom_cents"),
            expr("CAST((1000000 * SUM(eom_balance)) div COUNT(*) AS BIGINT)")
              .as("avg_eom_ppm"))
          .orderBy(col("ym"))
      },
      Some("""
        WITH flows AS (
          SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
                 o_orderkey AS ok,
                 CASE WHEN o_orderkey % 3 = 0
                      THEN -CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)
                      ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)
                 END AS delta
          FROM orders),
        bal AS (
          SELECT ck, d, ok,
                 CAST(SUM(delta) OVER (PARTITION BY ck ORDER BY d, ok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS balance,
                 CAST(YEAR(d)*100 + MONTH(d) AS BIGINT) AS ym
          FROM flows),
        eom AS (
          SELECT ck, ym, balance AS eom_balance FROM (
            SELECT ck, ym, balance,
                   row_number() OVER (PARTITION BY ck, ym
                     ORDER BY d DESC, ok DESC) AS rn
            FROM bal) WHERE rn = 1)
        SELECT ym,
               CAST(COUNT(*) AS BIGINT) AS n_accounts,
               CAST(SUM(eom_balance) AS BIGINT) AS total_eom_cents,
               CAST((1000000 * SUM(eom_balance)) // COUNT(*) AS BIGINT)
                 AS avg_eom_ppm
        FROM eom
        GROUP BY ym
        ORDER BY ym""")))
}
