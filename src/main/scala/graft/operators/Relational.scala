package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classic relational analytics over the TPC-H-style tables — the
  * multi-table side of the engine: grouped aggregation with pushed-down
  * predicates (Q1) and the broadcast-dimension join chain (Q3). These
  * demonstrate the plan shapes a 100 TB relational workload needs:
  * filters reach the parquet scans (`PushedFilters`), TRUE dimension
  * tables broadcast by explicit hint (customer is ~1/40 of lineitem
  * here and shrinks further after its segment filter — never shuffle
  * the fact table for a dim), FACT-DERIVED frames (filtered orders,
  * part) are deliberately unhinted so AQE broadcasts them while they
  * fit and falls back to a shuffle join at the scale where a forced
  * hint would OOM, and top-k is `TakeOrderedAndProject`, not a global
  * sort.
  *
  * Money arithmetic routes through DECIMAL(18,2): the source doubles
  * are 2-dp money values, so the cast is EXACT, and decimal addition
  * is associative — distributed summation order cannot perturb the
  * result (the same trick the events oracles use). Outputs cast back
  * to double identically in the DuckDB mirrors.
  */
object Relational {

  import Money.dec

  /** TPC-H Q1: pricing summary report. One scan, one shuffle keyed by
    * the 4-value (returnflag, linestatus) pair, map-side partials do
    * almost all the work. Averages are sum/count double divisions (not
    * `avg`) so both engines compute the identical operation.
    */
  def pricingSummary(lineitem: DataFrame,
      shipBefore: String = "1998-09-02 00:00:00"): DataFrame = {
    val discPrice = dec(col("l_extendedprice")) * (Money.one - dec(col("l_discount")))
    val charge = discPrice * (Money.one + dec(col("l_tax")))
    lineitem
      .filter(col("l_shipdate") <= lit(shipBefore).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q5: local-supplier revenue per nation — the full
    * six-table join. True dimensions (region → nation → supplier;
    * customer) broadcast by hint; the orders-derived frame is unhinted
    * (AQE-sized, see inline note). The c_nationkey = s_nationkey
    * "local supplier" constraint rides on the orders-side join.
    */
  def localSupplierRevenue(region: DataFrame, nation: DataFrame,
      supplier: DataFrame, customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, regionName: String = "ASIA",
      from: String = "1996-01-01 00:00:00",
      until: String = "1997-01-01 00:00:00"): DataFrame = {
    val nations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = supplier
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ordCust = orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    // NO broadcast hint on ordCust: it is FACT-derived (a year of orders
    // ⋈ customer) and grows linearly with scale factor — a forced hint
    // would bypass autoBroadcastJoinThreshold and OOM at 100× where an
    // unhinted plan lets AQE pick broadcast while it fits and fall back
    // to a shuffle join when it doesn't. Hints stay only on the true
    // dimensions (region/nation chain, customer projection) above.
    lineitem
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ordCust,
        col("l_orderkey") === col("o_orderkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) *
          (Money.one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q14: promo revenue share over a ship-date month — filtered
    * fact ⋈ part (AQE-sized join) with a conditional aggregate; the
    * percentage is a double division of two exact decimal sums.
    */
  def promoRevenue(lineitem: DataFrame, part: DataFrame,
      from: String = "1996-01-01 00:00:00",
      until: String = "1996-02-01 00:00:00"): DataFrame = {
    val discPrice = dec(col("l_extendedprice")) *
      (Money.one - dec(col("l_discount")))
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      // unhinted: part scales linearly with SF (~p_partkey per 30
      // lineitems), so a forced broadcast is a 100×-scale OOM; AQE
      // broadcasts the 2-column projection while it fits and degrades
      // to a shuffle join past the threshold
      .join(part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", discPrice)).as("promo"),
        sum(discPrice).as("total"))
      .select((lit(100.0) * col("promo").cast("double") /
        col("total").cast("double")).as("promo_revenue_pct"))
  }

  /** TPC-H Q4-style order-priority check — the LEFT SEMI join shape:
    * count orders per priority that had at least one line shipped
    * after the order date, within an order-date quarter. (The classic
    * Q4 predicate is l_commitdate < l_receiptdate; this warehouse has
    * neither column, so the equivalent exists-per-order test rides on
    * l_shipdate > o_orderdate.)
    *
    * Scale shape: both sides are facts, so NO broadcast hint — the
    * semi join shuffles both on l_orderkey/o_orderkey and, unlike an
    * inner-join + distinct formulation, never materializes the
    * (order × matching-lines) blowup: a probe row emits once. The
    * date filter prunes the orders scan (PushedFilters); the lineitem
    * side projects two columns.
    */
  def orderPriorityCheck(orders: DataFrame, lineitem: DataFrame,
      from: String = "1996-01-01 00:00:00",
      until: String = "1996-04-01 00:00:00"): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q22-style inactive high-balance customers — the LEFT ANTI
    * join shape: per nation, count customers whose balance exceeds the
    * positive-balance average and who placed NO order since
    * `inactiveSince`. (Classic Q22 keys on phone country codes; this
    * warehouse has no c_phone, so nationkey carries the grouping and
    * the anti side gets a date window — every customer here has SOME
    * order.)
    *
    * The scalar subquery (corpus-wide average) is the distributed
    * idiom: a 1-row aggregate broadcast-cross-joined onto customer —
    * no driver collect, no second scan barrier. The average itself is
    * compared in EXACT decimal arithmetic (bal × n > total, not
    * bal > total/n): double averages fold order-dependently across
    * engines, decimal products don't, so both engines agree on every
    * boundary customer. The anti side is fact-derived (date-filtered
    * orders) — unhinted, AQE sizes it.
    */
  def inactiveHighBalanceCustomers(customer: DataFrame, orders: DataFrame,
      inactiveSince: String = "2000-01-01 00:00:00"): DataFrame = {
    val bal = customer.filter(col("c_acctbal") > 0.0)
      .agg(sum(dec(col("c_acctbal"))).as("total_bal"),
        count(lit(1)).as("n_pos"))
    customer
      .crossJoin(broadcast(bal))
      .filter(dec(col("c_acctbal")) * col("n_pos") > col("total_bal"))
      .join(orders
          .filter(col("o_orderdate") >= lit(inactiveSince).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H Q6: forecast-revenue change — the pure pushed-filter scan
    * aggregate: no join at all, every predicate (ship-date year,
    * discount band, quantity cap) reaches the parquet scan as a
    * PushedFilter, one map-side-combined global sum. The plan every
    * selective scan-aggregate should collapse to at any scale.
    * Revenue multiplies exact decimals (18,2 × 18,2 — no float fold).
    */
  def forecastRevenue(lineitem: DataFrame,
      from: String = "1996-01-01 00:00:00",
      until: String = "1997-01-01 00:00:00",
      minDiscount: Double = 0.05, maxDiscount: Double = 0.07,
      maxQuantity: Double = 24): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        col("l_discount") >= minDiscount && col("l_discount") <= maxDiscount &&
        col("l_quantity") < maxQuantity)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  /** TPC-H Q18: large-volume orders — the HAVING-subquery shape,
    * Spark-first: classic Q18 writes `o_orderkey IN (SELECT … GROUP BY
    * … HAVING sum > t)` and then re-aggregates lineitem; here the
    * HAVING aggregate IS the join input (its key is unique after the
    * groupBy, so an inner join carries both the membership test and
    * `total_qty` — no second lineitem pass, no semi+rejoin). Orders
    * join the (HAVING-filtered, small) aggregate unhinted; the
    * customer name lookup broadcasts; top-k is TakeOrderedAndProject
    * with an orderkey tie-break.
    */
  def largeOrders(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, minTotalQty: Double = 250, k: Int = 100): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > dec(lit(minTotalQty)))
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_totalprice"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
  }

  /** TPC-H Q10: returned-item revenue — top-k customers by revenue
    * lost to returns in a quarter. The two fact scans (flag-filtered
    * lineitem, date-filtered orders) join unhinted; the customer
    * projection and nation ride broadcast hints like Q3/Q5's dims.
    * Revenue ties break on c_custkey so the top-k is deterministic.
    */
  def returnedItemRevenue(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame,
      from: String = "1996-01-01 00:00:00",
      until: String = "1996-04-01 00:00:00", k: Int = 20): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders
          .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
            col("o_orderdate") < lit(until).cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) *
          (Money.one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** TPC-H Q3: shipping-priority top-10. The segment-filtered customer
    * dimension broadcasts into orders; the orders-derived frame joins
    * the lineitem fact unhinted (AQE-sized, see inline note); revenue
    * ties break on l_orderkey so the top-10 is deterministic.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, segment: String = "BUILDING",
      cutoff: String = "1995-03-15 00:00:00"): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val ord = orders.filter(col("o_orderdate") < cut)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
    // `ord` is FACT-derived (classic Q3 keeps ~10–50% of orders after
    // the date filter) and grows linearly with SF — no broadcast hint:
    // AQE broadcasts while it fits and falls back to a shuffle join at
    // the scale where a forced hint would OOM. Only `cust` (a true
    // dimension, further shrunk by its segment filter) keeps the hint.
    lineitem.filter(col("l_shipdate") > cut)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) *
          (Money.one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"),
        // parquet naive timestamps surface as TIMESTAMP_NTZ; the cast
        // pins them to the (UTC) session zone, matching the oracle's
        // naive epoch_us
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }
}
