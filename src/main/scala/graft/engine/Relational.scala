package graft.engine

import graft.engine.Caches.CacheOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface beyond the reference (SURVEY.md §2.7 marks these as
  * extensions, not parity): ranking/top-k, distinct, set operations, and a
  * grouped aggregate-statistics query.
  *
  * Determinism across engines:
  *  - top-k orders carry explicit unique tie-breakers;
  *  - money sums go through integer cents (see [[Stages]]) so no float
  *    summation-order noise reaches the output;
  *  - set ops use the SQL-standard distinct semantics on exact types.
  *
  * Scale notes: topKPerGroup is a single shuffle on the partition key with
  * in-partition sort — at 100 TB you'd pre-filter with an approximate
  * per-partition top-k (rank pushdown) before the shuffle; Spark's AQE +
  * `WindowGroupLimit` (Spark ≥3.5) already performs this rank-limit
  * pushdown for `row_number() <= k` predicates, which is why the filter is
  * written in exactly that shape.
  */
object Relational {

  /** Global top-`k` with a rank column, in the shape that scales: the
    * top-k itself is `orderBy(sort).limit(k)` → TakeOrderedAndProject
    * (per-partition heaps, driver merges k rows), and the rank is derived
    * afterwards over just the k survivors under a constant partition key
    * (a non-empty window spec over k rows — never an unpartitioned
    * WindowExec over the full input). `sort` must be a total order for
    * the rank to be deterministic.
    */
  def rankedTopK(df: DataFrame, k: Int, sort: org.apache.spark.sql.Column*): DataFrame =
    df.orderBy(sort: _*)
      .limit(k)
      .withColumn(
        "rank",
        row_number().over(Window.partitionBy(lit(1)).orderBy(sort: _*)).cast("long"))

  /** Top-k rows per group by a sort column, deterministic via tie-breaker
    * columns. The `row_number() <= k` shape lets Catalyst's
    * WindowGroupLimit prune per partition before the shuffle.
    */
  def topKPerGroup(df: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("l_returnflag"),
        col("rank").cast("long").as("rank"),
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_extendedprice"))
  }

  /** DISTINCT projection (dedup of the exact key set). */
  def distinctFlags(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_returnflag"), col("l_linestatus")).distinct()

  /** Set algebra: users with a high-value purchase AND a signup but no
    * high-value error — INTERSECT + EXCEPT with SQL distinct-set
    * semantics. (The value threshold keeps the result non-degenerate:
    * with unconditioned event types every active user matches all three
    * sets.)
    */
  def setOps(events: DataFrame): DataFrame = {
    def users(t: String, minValue: Double) =
      events
        .filter(col("event_type") === t && (if (minValue > 0) col("value") > minValue else lit(true)))
        .select(col("user_id"))
    users("purchase", 150).intersect(users("signup", 0)).except(users("error", 150))
  }

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) — the
    * multiplicity-aware twins of [[setOps]]: a user appearing 3× in
    * purchases and 2× in views survives the intersection twice, and
    * EXCEPT ALL then removes one occurrence per error event. Spark plans
    * both as count-aggregate-then-replicate (one shuffle per operand,
    * min/difference arithmetic on the counts — never row matching), the
    * only shape that scales; the output collapses to (user, multiplicity)
    * so the result is deterministic and hash-comparable.
    */
  def setOpsBag(events: DataFrame): DataFrame = {
    def users(t: String) =
      events.filter(col("event_type") === t).select(col("user_id"))
    users("purchase")
      .intersectAll(users("view"))
      .exceptAll(users("error"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("multiplicity"))
  }

  /** Grouped percentiles (median, p95) of extended price, computed over
    * integer cents with linear interpolation — Spark `percentile` and
    * DuckDB `quantile_cont` share the `lower + (upper-lower)·frac`
    * definition on exact inputs.
    */
  def percentiles(lineitem: DataFrame): DataFrame = {
    val priceCents = Stages.centsSql("l_extendedprice")
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"percentile($priceCents, 0.5) / CAST(100 AS DOUBLE)").as("p50_price"),
        expr(s"percentile($priceCents, 0.95) / CAST(100 AS DOUBLE)").as("p95_price"))
  }

  /** Grouped statistics over lineitem with fully exact arithmetic:
    * count/min/max/countDistinct plus integer-cents sums and half-up
    * averages — every output value is bit-identical across engines.
    */
  def aggStats(lineitem: DataFrame): DataFrame = {
    val qtyCents = Stages.centsSql("l_quantity")
    val priceCents = Stages.centsSql("l_extendedprice")
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        expr(s"sum($qtyCents) / CAST(100 AS DOUBLE)").as("sum_qty"),
        expr(s"sum($priceCents) / CAST(100 AS DOUBLE)").as("sum_base_price"),
        expr(Stages.halfUpAvgDollarsSql(priceCents)).as("avg_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
  }

  /** JSON scalar battery over the wire-format `props` column: path
    * extraction as string and as int, and an existence probe — the
    * operations a schema-on-read ingest layer runs before committing to
    * a typed column.
    */
  def jsonFuncs(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("long").as("k_int"),
      get_json_object(col("props"), "$.k").isNotNull.as("has_k"),
      get_json_object(col("props"), "$.missing").isNull.as("no_missing"))

  /** Regex scalar battery over documents, restricted to constructs whose
    * semantics agree between Java regex and RE2-style engines: anchored
    * capture, word-boundary counting, global replacement.
    */
  def regexFuncs(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
      regexp_count(col("text"), lit("\\ba[a-z]*")).cast("long").as("n_a_words"),
      regexp_replace(substring(col("text"), 1, 30), "\\s+", "-").as("dashed30"),
      col("text").rlike("spark").as("mentions_spark"))

  /** Top-2 distinct price maxima per flag through the custom typed
    * [[graft.functions.TopTwoAggregator]] — the `Aggregator`/`udaf` API
    * surface exercised end-to-end: two-long state, partial aggregation
    * on every executor, partials merged after the k-key shuffle exactly
    * like a built-in aggregate.
    */
  def topTwoAgg(lineitem: DataFrame): DataFrame = {
    val top2 = org.apache.spark.sql.functions.udaf(graft.functions.TopTwoAggregator)
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        top2(expr(Stages.centsSql("l_extendedprice"))).as("t2"))
      .select(
        col("l_returnflag"), col("n_rows"),
        (col("t2._1").cast("double") / 100.0).as("max_price"),
        // The aggregator's two-long state marks "no second DISTINCT
        // value" with a Long.MinValue sentinel (a tuple encoder cannot
        // carry null longs); unmasked, a constant-price group leaked
        // the sentinel as second_price = -9.2e16 dollars where the
        // oracle's max(CASE ...) yields NULL (r10 degenerate probe).
        when(col("t2._2") === lit(Long.MinValue), lit(null))
          .otherwise(col("t2._2").cast("double") / 100.0).as("second_price"))
  }

  /** max_by / min_by battery with a DETERMINISTIC composite ordering key
    * (cents·10⁸ + event id) — argmin/argmax ties on the raw value would
    * otherwise make the picked id engine-dependent. One map-combined
    * aggregate per type.
    */
  def argMinMax(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), col("event_id"), expr(Stages.centsSql("value")).as("c"))
      .withColumn("key", expr("c * 100000000 + event_id"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("max_by(event_id, key)").as("max_event_id"),
        expr("min_by(event_id, key)").as("min_event_id"),
        max(col("c")).as("max_cents"),
        min(col("c")).as("min_cents"))

  /** Boolean-aggregate battery (every / any / count_if) per event type —
    * the predicate-aggregation surface, map-combined.
    */
  def boolAggs(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("every(value > 0)").as("all_positive"),
        expr("any(value > 100)").as("any_large"),
        expr("count_if(value > 100)").as("n_large"))

  /** Exact DISCRETE quantiles (type-1: smallest value whose CDF reaches
    * q) per return flag, computed on the value grid: distinct cents with
    * per-flag cumulative counts, then `min(x : 100·cum ≥ q·n)` — pure
    * integer comparisons, so there is no interpolation-convention or FP
    * ambiguity to disagree on across engines (the reason this exists
    * beside the `percentile_cont`-based q_percentiles). The cumulative
    * window runs per flag over the VALUE GRID — value-domain bounded,
    * never corpus-bounded — and the quantile picks are one map-combined
    * conditional-min aggregate.
    */
  /** PINNED (l_returnflag, cents extendedprice) → count distribution —
    * the cents-grained sibling of [[madOutliers]]' floor-dollar
    * histogram: [[discQuantiles]] and [[Inference.trimmedMean]] both run
    * their value-grid windows over it. Bounded by the price grid ×
    * flags, not the row count.
    */
  private[engine] def centsDistByFlag(lineitem: DataFrame): DataFrame =
    Views.pinned(lineitem, "centsDistByFlag")(
      _.groupBy(col("l_returnflag"), expr(Stages.centsSql("l_extendedprice")).as("x"))
        .agg(count(lit(1)).as("cnt")))

  def discQuantiles(lineitem: DataFrame): DataFrame = {
    val grid = centsDistByFlag(lineitem).withColumnRenamed("cnt", "c")
    val w = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = grid.withColumn("cum", sum(col("c")).over(w))
    val n = grid.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n_rows"))
    def pick(q: Int) =
      (min(when(expr(s"100 * cum >= $q * n_rows"), col("x"))).cast("double") / 100.0)
        .as(s"p$q")
    cum
      .join(n, "l_returnflag")
      .groupBy(col("l_returnflag"), col("n_rows"))
      .agg(pick(25), pick(50), pick(75), pick(95))
  }

  /** Math scalar battery over line items, restricted to operations with
    * bit-portable results: |x|, sign, integer div/mod, exact small-int
    * powers, the correctly-rounded `sqrt`, greatest/least, and the
    * binary-magnitude trick `length(bin(n))` = ⌊log2 n⌋+1 — the
    * log-function-free way to read a value's order of magnitude (both
    * engines print identical binary strings; no libm involved). Floors
    * and ceilings run on integer cents (`div`), never on a double
    * quotient, so no value can straddle an FP rounding boundary.
    */
  def mathFuncs(lineitem: DataFrame): DataFrame = {
    val cents = Stages.centsSql("l_extendedprice")
    lineitem.select(
      col("l_orderkey"),
      col("l_linenumber").cast("long").as("l_linenumber"),
      expr("abs(l_quantity - 25.0)").as("q_abs"),
      expr("CAST(sign(l_quantity - 25.0) AS BIGINT)").as("q_sign"),
      // Measured r10: DuckDB's INTEGER `//` truncates toward zero
      // exactly like Spark's `div` (-98765432 // 100000 = -987), so
      // these integer divisions are cross-engine identical for ALL
      // signs; the +denom-1 form is true ceil only for non-negative
      // numerators, but both engines compute the same value either way.
      expr(s"$cents div 100000").as("p_floor_k"),
      expr(s"($cents + 99999) div 100000").as("p_ceil_k"),
      expr("l_orderkey % 7").as("k_mod7"),
      expr("l_quantity * l_quantity").as("q_sq"),
      // CASE: sqrt of a negative is NaN in Spark but an error in DuckDB
      // — NULL on both engines is the portable semantics (extreme-
      // fixture sweep, r10); non-negative inputs are untouched.
      expr("CASE WHEN l_quantity < 0 THEN NULL ELSE sqrt(l_quantity) END").as("q_sqrt"),
      expr("greatest(l_quantity, 25.0)").as("q_hi"),
      expr("least(l_quantity, 25.0)").as("q_lo"),
      expr(s"CAST(length(bin($cents)) AS BIGINT)").as("p_bits"))
  }

  /** Bitwise-function battery: per (returnflag, linestatus) group, the
    * bit_and/bit_or/bit_xor aggregates over order keys plus scalar
    * AND/OR/XOR/shift/popcount folds — integer-exact on any engine. One
    * map-combined aggregate over the 6-ish flag pairs.
    */
  def bitFuncs(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_and(l_orderkey)").as("key_and"),
        expr("bit_or(l_orderkey)").as("key_or"),
        expr("bit_xor(l_orderkey)").as("key_xor"),
        sum(expr("bit_count(l_orderkey)").cast("long")).as("popcount_sum"),
        sum(expr("l_orderkey & 255")).as("low_byte_sum"),
        sum(expr("CAST(shiftleft(l_linenumber, 3) AS BIGINT)")).as("shifted_sum"))

  /** Datetime scalar battery over event time — every extraction is an
    * int cast to long (cross-engine width parity) and dayofweek is
    * normalized to Spark's Sunday=1 convention.
    */
  def datetimeFuncs(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      year(col("ts")).cast("long").as("y"),
      quarter(col("ts")).cast("long").as("q"),
      month(col("ts")).cast("long").as("mo"),
      dayofmonth(col("ts")).cast("long").as("d"),
      dayofweek(col("ts")).cast("long").as("dow"),
      dayofyear(col("ts")).cast("long").as("doy"),
      hour(col("ts")).cast("long").as("h"),
      minute(col("ts")).cast("long").as("mi"),
      second(col("ts")).cast("long").as("s"))

  /** Z-order layout statistics: every row gets a Morton key interleaving
    * its (quantity, price-bucket) coordinates, rows are grouped into
    * zkey ranges ("files"), and each range reports its min/max on BOTH
    * dimensions — the file-statistics table that shows why Z-ORDER
    * clustering prunes on either predicate (each range spans a small
    * box in (x, y) space, unlike a single-column sort where the second
    * dimension spans everything). The key is [[Stages.mortonSql]]
    * integer arithmetic computed map-side; one map-combined aggregate
    * on the range id; output is |ranges|-bounded.
    */
  def zorderLayout(lineitem: DataFrame): DataFrame =
    lineitem
      .select(
        expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr(s"${Stages.centsSql("l_extendedprice")} div 100 div 512").as("y"))
      .withColumn("zkey", expr(Stages.mortonSql("x", "y", 8)))
      .groupBy(expr("zkey div 256").as("zrange"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))

  /** Model-based outlier detection: rows whose price deviates from the
    * per-group OLS price-vs-quantity line by more than `mult`·rmse —
    * the residual screen that catches mispriced rows a plain z-score
    * misses (it conditions on quantity). Same two-pass shape as
    * [[zscoreNormalize]]: one map-combined moment pass (6 integer sums
    * per group), one broadcast join back to the facts, and the
    * [[Stages.residualSql]] closed form per row — no window, nothing
    * but the moment state shuffles, bit-identical on any engine.
    */
  def regressionOutliers(lineitem: DataFrame, mult: String = "1.6"): DataFrame = {
    val base = lineitem.select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
      expr(s"${Stages.centsSql("l_extendedprice")} div 100").as("y"))
    val moments = base
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    base
      .join(broadcast(moments), "l_returnflag")
      .filter(expr(Stages.residualOutlierCondSql(mult)))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("x"), col("y"), expr(Stages.residualSql).as("resid"))
  }

  /** Benford first-digit audit over extended price: the first decimal
    * digit of the exact integer cents (string head of a BIGINT —
    * engine-identical, unlike log₁₀ bucketing), counted and shared
    * against the total via one crossed 1-row aggregate. The
    * fraud/data-quality screen: natural multiplicative data leans on
    * low digits; uniform or truncated generators don't. Output is
    * 9-rowed; everything map-combines.
    */
  def benfordDigits(lineitem: DataFrame): DataFrame = {
    val byDigit = lineitem
      .groupBy(
        expr(s"CAST(substring(CAST(${Stages.centsSql("l_extendedprice")} AS STRING), 1, 1) AS BIGINT)")
          .as("digit"))
      .agg(count(lit(1)).as("n"))
    val total = byDigit.agg(sum(col("n")).as("total"))
    byDigit
      .crossJoin(total)
      .select(
        col("digit"), col("n"),
        expr("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)").as("share"))
  }

  /** Referential-integrity audit — the FK conformance report a pipeline
    * runs before joining fact tables at scale: per relation, child
    * cardinality, orphan count (left-anti against the parent), and the
    * orphan rate. Each relation is two aggregates and one anti-join on
    * the FK (broadcastable parents broadcast); the result is
    * |relations|-sized. The last relation checks conformance against a
    * FILTERED dimension subset (BUILDING-segment customers) — the
    * "active slice" check that, unlike plain PK/FK integrity, is
    * routinely non-zero in practice.
    */
  def fkOrphans(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      part: DataFrame,
      events: DataFrame): DataFrame = {
    def audit(name: String, child: DataFrame, key: String, parent: DataFrame, pkey: String) = {
      val orphans = child
        .join(parent.select(col(pkey)), child(key) === col(pkey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child
        .agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans)
        .select(
          lit(name).as("relation"), col("n_child"), col("n_orphans"),
          expr("CAST(n_orphans AS DOUBLE) / nullif(CAST(n_child AS DOUBLE), 0.0E0)").as("orphan_rate"))
    }
    audit("lineitem.orderkey", lineitem, "l_orderkey", orders, "o_orderkey")
      .unionByName(audit("orders.custkey", orders, "o_custkey", customer, "c_custkey"))
      .unionByName(audit("lineitem.partkey", lineitem, "l_partkey", part, "p_partkey"))
      .unionByName(audit("events.user_building", events, "user_id",
        customer.filter(col("c_mktsegment") === "BUILDING"), "c_custkey"))
  }

  /** Null-handling scalar battery — coalesce / nullif / greatest /
    * least / null predicates over a deterministically nulled value
    * column (the fixtures carry no natural nulls, so `event_id % 5 = 0`
    * synthesizes them in-plan). greatest/least skip NULL operands on
    * both ANSI engines; values pass through without re-rounding, so
    * every output is engine-exact.
    */
  def nullFuncs(events: DataFrame): DataFrame =
    events
      .withColumn("v", expr("CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END"))
      .select(
        col("event_id"),
        coalesce(col("v"), lit(-1.0)).as("v_or_neg1"),
        expr("nullif(event_type, 'error')").as("type_no_error"),
        greatest(col("v"), lit(50.0)).as("v_floor50"),
        least(col("v"), lit(50.0)).as("v_cap50"),
        col("v").isNull.as("v_is_null"),
        expr("CASE WHEN v IS NULL THEN 'missing' ELSE 'present' END").as("v_status"))

  /** Fixed-width value histogram: bucket = ⌊cents / width⌋ computed
    * map-side, one combine-enabled shuffle — the plan shape histograms
    * keep at any scale.
    */
  def valueHistogram(events: DataFrame, widthCents: Long): DataFrame =
    events
      .groupBy(expr(s"${Stages.centsSql("value")} div $widthCents").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** TPC-H Q3-shaped star join: filtered customer → orders → lineitem,
    * revenue per order, top `k` orders. Catalyst broadcasts the filtered
    * customer side and pushes both date filters into the scans; revenue
    * is exact integer arithmetic — price and discount have two decimals,
    * so `cents(price) · (100 − pct(discount))` is an integer number of
    * hundredth-cents and sums without float nondeterminism.
    */
  def starRevenueTopK(
      customer: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame,
      segment: String,
      k: Int): DataFrame = {
    val revenueMicros = Stages.lineitemRevUnitsSql
    rankedTopK(
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer.filter(col("c_mktsegment") === segment), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(expr(s"sum($revenueMicros) / CAST(10000 AS DOUBLE)").as("revenue")),
      k, col("revenue").desc, col("o_orderkey").asc)
      .select(col("rank"), col("o_orderkey"), col("o_orderpriority"), col("revenue"))
  }

  /** TPC-H Q5-shaped "local supplier" volume: revenue from lineitems whose
    * supplier and ordering customer sit in the SAME nation of one region,
    * over one order-date year. The nation⋈region dimension broadcasts to
    * the customer leg; supplier broadcasts to the fact side; the
    * `s_nationkey = c_nationkey` locality test rides ON the supplier join
    * (a join condition, not a post-filter), so non-local pairs die inside
    * the build-side probe. Only the orders⋈lineitem join shuffles, on the
    * key both sides already produce. Revenue is exact hundredth-cent
    * integers (`cents · (100 − pct)`) summed as BIGINT and divided once —
    * exact below 2^53 hundredth-cents per nation (~$9×10^12; past that
    * the DECIMAL(38) sum is the cluster-scale follow-up).
    */
  def localSupplierVolume(
      customer: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String,
      yearStart: String,
      yearEndExcl: String): DataFrame = {
    val localNations = nation
      .join(
        broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer
      .join(broadcast(localNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = orders
      .filter(
        col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
          col("o_orderdate") < lit(yearEndExcl).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val revenueMicros = Stages.lineitemRevUnitsSql
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"), expr(revenueMicros).as("rev_micros"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(
        broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        expr("sum(rev_micros) / CAST(10000 AS DOUBLE)").as("revenue"))
  }

  /** Sketch-based distinct counting, self-validated: per group, the exact
    * distinct count alongside a flag that Spark's HyperLogLog++
    * (`approx_count_distinct`, default rsd 5%) landed within `tol` of it.
    * At 100 TB the exact column is what you drop and the sketch is what
    * you keep — HLL merges partially, needs no distinct shuffle, and its
    * error is independent of cardinality; this query pins the sketch's
    * accuracy contract into the correctness gate.
    */
  /** Sketch-based percentile, self-validated like [[approxDistinctCheck]]:
    * exact median alongside a flag that `approx_percentile` (accuracy
    * 10000 → rank error ≤ 0.01%) landed between the exact 49th and 51st
    * percentiles — a rank-space tolerance, so the check is scale-free.
    * At 100 TB the sketch is what survives: it merges per-partition and
    * never materializes the sorted column.
    */
  def approxPercentileCheck(lineitem: DataFrame): DataFrame = {
    val cents = Stages.centsSql("l_extendedprice")
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"percentile($cents, 0.5) / CAST(100 AS DOUBLE)").as("p50_exact"),
        expr(s"approx_percentile($cents, 0.5, 10000)").as("approx_cents"),
        // DISCRETE rank bounds, not interpolated percentile(): the
        // sketch returns an actual data value with rank error <=
        // n/10000, which always lies within the 49th-51st DISCRETE
        // percentile values — but can sit outside an INTERPOLATED
        // midpoint on gappy distributions, failing the check on a
        // correct sketch (extreme sweep, r10). This makes the oracle's
        // always-TRUE contract genuinely input-independent.
        expr(s"percentile_disc(0.49) WITHIN GROUP (ORDER BY $cents)").as("lo"),
        expr(s"percentile_disc(0.51) WITHIN GROUP (ORDER BY $cents)").as("hi"))
      .select(
        col("l_returnflag"),
        col("p50_exact"),
        (col("approx_cents") >= col("lo") && col("approx_cents") <= col("hi"))
          .as("sketch_within_rank_tol"))
  }

  /** Deterministic hash-mod sampling — the stable eval-set selector of a
    * training pipeline: a row is kept iff an md5-derived hash of its key
    * ≡ 0 (mod `mod`). Unlike `TABLESAMPLE`/`rand()`, membership is a pure
    * function of the key: reproducible across runs, engines, and
    * repartitionings, and evaluated map-side with zero shuffle.
    */
  def hashModSample(events: DataFrame, mod: Int): DataFrame =
    events
      .filter(expr(
        s"cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % $mod = 0"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** Deterministic 80/10/10 train/validation/test assignment with a
    * per-(split, event_type) stratification report — the split audit a
    * training pipeline runs to confirm the hash assignment didn't skew
    * any class. Assignment hashes the stable row id (md5 head, the
    * repo-wide sampling idiom), so it is reproducible on any engine and
    * any run; the report is one map-combined aggregate, output
    * 3·|classes|-sized.
    */
  def dataSplitReport(events: DataFrame): DataFrame = {
    val bucket =
      "cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % 10"
    events
      .withColumn(
        "split",
        expr(s"CASE WHEN $bucket < 8 THEN 'train' WHEN $bucket = 8 THEN 'valid' ELSE 'test' END"))
      .groupBy(col("split"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Post-stratified estimation readout: the survey-sampling bias
    * correction for a hash sample whose strata mix drifted from the
    * population. Per event-type stratum: the TRUE population share
    * (weight = N_h/N, known exactly — strata counts come from the full
    * scan), the 10% md5-hash sample's size and mean value, and the
    * stratum's contribution weight·mean to the post-stratified total —
    * Σ contributions estimates the population mean with the sample-mix
    * bias removed. One map-combined aggregate computes population and
    * sample moments together (the sample terms are conditional sums, no
    * second scan); every division is a fixed IEEE tree over exact
    * integers. Per-stratum rows keep the output deterministic — the
    * cross-stratum Σ would be a float sum whose order an engine is free
    * to choose.
    */
  def postStratified(events: DataFrame): DataFrame = {
    val bucket =
      "cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % 10"
    val strata = events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_pop"),
        sum(when(expr(s"$bucket = 0"), 1L).otherwise(0L)).as("n_sample"),
        sum(when(expr(s"$bucket = 0"), expr(Stages.centsSql("value"))).otherwise(lit(0L)))
          .as("s_cents"))
    strata
      .crossJoin(broadcast(strata.agg(sum(col("n_pop")).as("n_total"))))
      .withColumn("weight", expr("CAST(n_pop AS DOUBLE) / CAST(n_total AS DOUBLE)"))
      .withColumn(
        "sample_mean",
        expr("CASE WHEN n_sample = 0 THEN NULL ELSE " +
          "(CAST(s_cents AS DOUBLE) / CAST(n_sample AS DOUBLE)) / 100.0 END"))
      .withColumn("contribution", col("weight") * col("sample_mean"))
      .select(
        col("event_type"), col("n_pop"), col("n_sample"),
        col("weight"), col("sample_mean"), col("contribution"))
  }

  /** Top-`k` users by Wilson-lower-bound purchase propensity: raw
    * purchase rates rank a 1/1 user above a 40/50 one; the
    * [[Stages.wilsonLowerSql]] bound corrects for sample size. One
    * map-combined per-user aggregate (two longs of state), closed-form
    * scoring, TakeOrdered top-k — nothing user-corpus-sized survives
    * the aggregate.
    */
  def wilsonTopUsers(events: DataFrame, k: Int): DataFrame =
    rankedTopK(
      events
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c"))
        .select(
          col("user_id"), col("n"), col("c"),
          expr(Stages.wilsonLowerSql).as("wilson_lb")),
      k, col("wilson_lb").desc, col("user_id").asc)
      .select(col("rank"), col("user_id"), col("n"), col("c"), col("wilson_lb"))

  /** Weighted median value per group (weights = order quantity):
    * accumulate weights in a running window over the compressed
    * (group, value) → Σweight distribution and take the first value
    * whose doubled cumulative weight reaches the group total — the
    * exact lower weighted median, all in integer arithmetic. The window
    * sorts the value grid, never the facts.
    */
  def weightedMedian(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // One map-combined shuffle compresses the facts to the PINNED
    // (flag, dollar) → Σweight distribution; the running-weight window
    // then sorts the value grid, not the corpus. r10 single-consumer
    // A/B (BASELINE.md): demotion costs q_weighted_median +1.36 s
    // best-of-2 for ~0 board relief — residency wins. The former spelling
    // windowed the raw rows partitioned by l_returnflag — THREE distinct
    // partition keys, so at 100 TB each window partition is corpus/3: a
    // skew shape the plan audit cannot see (the spec is non-empty). The
    // first value whose end-of-value doubled cumulative weight reaches
    // the group total is the same lower weighted median the row-level
    // window selected (any row of value y crossing the threshold implies
    // y's end-cum crosses, and conversely the crossing end-cum row IS a
    // row of y).
    // greatest(wt, 0): the grid/row equivalence above needs MONOTONE
    // cumulative weight — a negative quantity lets a mid-value row
    // cross the threshold transiently and the two spellings pick
    // different medians (extreme sweep, r10). Clamping defines the
    // contract (negative weights carry no median mass) identically in
    // engine and oracle; positive fixtures are untouched.
    val dist = Views.pinned(lineitem, "qtyWeightDistByFlag")(
      _.select(
        col("l_returnflag"),
        expr("greatest(CAST(round(l_quantity) AS BIGINT), 0)").as("wt"),
        expr(s"${Stages.centsSql("l_extendedprice")} div 100").as("y"))
        .groupBy(col("l_returnflag"), col("y"))
        .agg(sum(col("wt")).as("wt")))
    val w = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("y").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    dist
      .withColumn("cumw", sum(col("wt")).over(w))
      .withColumn("totw", sum(col("wt")).over(wAll))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("y")).as("weighted_median"), max(col("totw")).as("total_weight"))
  }

  /** Latest record per key — the CDC/compaction primitive: of all events
    * for a user, the one with the greatest (ts, event_id). Implemented as
    * ONE aggregation with `max_by` on a struct ordering key, not a
    * `row_number` window: the aggregate combines map-side (each partition
    * contributes one candidate row per key), so only |keys| rows reach the
    * shuffle — at 100 TB a window would sort the whole corpus within key
    * partitions; this shape never materializes more than one row per key
    * per partition. The (ts, event_id) key makes the argmax total even if
    * two events share a timestamp.
    */
  def latestByKey(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        max_by(
          struct(col("event_id"), col("ts"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"))
      .select(
        col("user_id"),
        col("last.event_id").as("event_id"),
        col("last.ts").as("ts"),
        col("last.event_type").as("event_type"),
        col("last.value").as("value"))

  /** Stratified deterministic sampling — the training-mix selector: each
    * stratum (event_type) keeps rows at its own rate `num/denom`, decided
    * by an md5-derived hash of the row key (same family as
    * [[hashModSample]]). Membership is a pure function of (key, stratum
    * rates): reproducible across runs, engines, and repartitionings, and
    * evaluated map-side with zero shuffle — rebalancing a 100 TB corpus
    * (e.g. downweight crawl, upweight code) without a sort, sample-file,
    * or rand() anywhere.
    */
  def stratifiedHashSample(
      events: DataFrame,
      strata: Map[String, Int],
      defaultNum: Int,
      denom: Int): DataFrame = {
    val hash =
      expr(s"cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % $denom")
    // Column-built CASE chain (no string interpolation of stratum names —
    // a quote in a key must stay a value, never become SQL)
    val threshold = strata.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultNum)) { case (other, (t, num)) =>
        when(col("event_type") === lit(t), lit(num)).otherwise(other)
      }
    events
      .filter(hash < threshold)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  /** GROUPING SETS ((status, priority), (status), ()) over orders — the
    * explicit-sets sibling of rollup/cube (Spark ≥3.4 exposes
    * `Dataset.groupingSets` natively; one shuffle, the sets expand
    * map-side via Expand exactly like rollup). Money sums go through
    * integer cents; `grouping_id` disambiguates real NULLs from subtotal
    * rows.
    */
  def groupingSetsStats(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(
          Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")),
          Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr(s"sum(${Stages.centsSql("o_totalprice")}) / CAST(100 AS DOUBLE)").as("sum_price"),
        grouping_id().as("gid"))

  /** Correlation/covariance/stddev of price (floor dollars) vs quantity
    * per return flag, computed from sufficient statistics: exact BIGINT
    * sums of (x, y, xy, x², y²) — the one-pass, partially-aggregatable
    * moment sketch. The built-in `corr`/`covar_samp` accumulate doubles
    * whose value depends on partition order (non-deterministic across
    * engines AND across runs); integer moments are exact, and the final
    * closed-form arithmetic is a fixed IEEE expression tree evaluated
    * identically everywhere ([[Stages.momentStatsSql]] — the SAME SQL text
    * runs on Spark and the oracle). At 100 TB this is also the faster
    * plan: five integer sums, map-combined, one narrow shuffle.
    */
  def sufficientStatsCorr(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("x", expr(s"${Stages.centsSql("l_extendedprice")} div 100"))
      .withColumn("y", expr("CAST(round(l_quantity) AS BIGINT)"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(
        Seq(col("l_returnflag"), col("n")) ++
          Stages.momentStatsSql.map { case (name, sql) => expr(sql).as(name) }: _*)

  /** Per-group ordinary-least-squares fit (price-vs-quantity line per
    * return flag) from the same exact integer sufficient statistics as
    * [[sufficientStatsCorr]]: one map-combined moment pass, then the
    * closed-form slope/intercept/r² of [[Stages.linregSql]] — a fixed
    * IEEE tree over exact integers, bit-identical on any engine, unlike
    * built-in `regr_slope` whose double accumulation is partition-order
    * dependent. Group cardinality bounds the output; nothing but the
    * 6-column moment state ever shuffles.
    */
  def linearRegression(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("x", expr("CAST(round(l_quantity) AS BIGINT)"))
      .withColumn("y", expr(s"${Stages.centsSql("l_extendedprice")} div 100"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(
        Seq(col("l_returnflag"), col("n")) ++
          Stages.linregSql.map { case (name, sql) => expr(sql).as(name) }: _*)

  /** Distinct count per (possibly skewed) group key via explicit salted
    * two-phase aggregation: phase 1 groups by (key, salt-of-user) and
    * counts distinct users inside each salt bucket; phase 2 sums the
    * partials. Salting on the DISTINCT key means each user lands in
    * exactly one bucket per group, so the partial counts add exactly —
    * and no single task ever holds a hot key's full user set, which is
    * what OOMs a naive `count(distinct)` when one key owns 10% of a
    * 100 TB corpus. (Plain sums don't need this — map-side combine
    * absorbs skew; distinct is the aggregation whose state grows with the
    * key.)
    */
  def skewedDistinct(events: DataFrame, salts: Int = 16): DataFrame =
    events
      .groupBy(col("event_type"), pmod(hash(col("user_id")), lit(salts)).as("salt"))
      .agg(countDistinct(col("user_id")).as("pd"), count(lit(1)).as("pn"))
      .groupBy(col("event_type"))
      .agg(sum(col("pd")).cast("long").as("n_users"), sum(col("pn")).cast("long").as("n_events"))

  /** Heavy hitters, self-validated like [[approxDistinctCheck]]: the
    * exact top-`k` keys by row count, each flagged if a Count-Min sketch
    * (`count_min_sketch`, eps ⇒ overcount ≤ eps·N w.p. `confidence`)
    * estimated its count within 1% of N — a 10× margin over the eps
    * bound. At 100 TB the exact side is what you drop: the sketch is
    * fixed-size, merges per-partition, and answers any key's frequency
    * without a per-key shuffle. Only the finished sketch (a few KB)
    * reaches the driver.
    */
  def heavyHittersCheck(events: DataFrame, k: Int, eps: Double = 0.001): DataFrame = {
    val total = events.count()
    val bytes = events
      .agg(count_min_sketch(col("user_id"), lit(eps), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val est = udf((u: Long) => cms.estimateCount(u))
    val tol = math.max(1L, (0.01 * total).toLong)
    rankedTopK(
      events.groupBy(col("user_id")).agg(count(lit(1)).as("n")),
      k, col("n").desc, col("user_id").asc)
      .withColumn(
        "cms_within_tol",
        est(col("user_id")) >= col("n") && est(col("user_id")) - col("n") <= lit(tol))
      .select(col("rank"), col("user_id"), col("n"), col("cms_within_tol"))
  }

  def approxDistinctCheck(lineitem: DataFrame, tol: Double = 0.05): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        // rsd 1% against a 5% tolerance = a 5-sigma margin, so the flag is
        // a stable property of the algorithm, not a coin flip per group
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx"))
      .select(
        col("l_returnflag"),
        col("exact_orders"),
        (abs(col("approx") - col("exact_orders")) <= col("exact_orders") * tol)
          .as("hll_within_tol"))

  /** Equal-frequency binning (feature bucketization): decile boundaries
    * from one exact `percentile` pass (a single 9-double row, broadcast),
    * then each row's bin = 1 + count of boundaries strictly below it —
    * an in-row array fold, no sort and no window over the facts.
    * Floor-dollar integers keep the exact-percentile value→count buffer
    * ~100× smaller than cents would (same trick as [[madOutliers]]), and
    * make every boundary comparison robust: interpolated boundaries are
    * either exact (integral rank index) or strictly between two
    * integers, so no row sits within an ulp of its boundary on either
    * engine. At 100 TB the boundary pass becomes `approx_percentile`
    * and the assignment stage is unchanged.
    */
  def equalFreqBins(lineitem: DataFrame, nBins: Int = 10): DataFrame = {
    // same distribution-compression trick as [[madOutliers]]: boundaries
    // AND bin populations both come from the (value → count) table; the
    // fact rows shuffle once and are never revisited. Derived from the
    // PINNED per-flag distribution (see [[dollarDist]]) by one
    // distribution-sized re-aggregation, so this query and q_mad_outliers
    // share a single corpus scan per session.
    val dist = dollarDist(lineitem)
      .groupBy(col("x"))
      .agg(sum(col("cnt")).as("cnt"))
      .cacheT()
    val fracs = (1 until nBins).map(i => (i.toDouble / nBins).toString).mkString(", ")
    val bounds = dist.agg(expr(s"percentile(x, array($fracs), cnt)").as("bounds"))
    dist
      .join(broadcast(bounds))
      .withColumn("bin", (size(filter(col("bounds"), b => col("x") > b)) + 1).cast("long"))
      .groupBy(col("bin"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        min(col("x")).as("lo_dollars"),
        max(col("x")).as("hi_dollars"))
  }

  /** Bottom-k-by-hash distinct sample per group — the KMV (k minimum
    * values) sketch shape: the k distinct users whose md5-derived hash is
    * smallest within each event_type. A deterministic, mergeable
    * "reservoir": any partitioning of the data yields the same k rows
    * (min-hashes commute with union), which is how a distributed sampler
    * avoids both `rand()` and a global sort. The `row_number ≤ k` spelling
    * gets WindowGroupLimit pushdown, so each partition forwards at most k
    * candidates per group to the shuffle.
    */
  def bottomKSample(events: DataFrame, k: Int): DataFrame = {
    val h = expr("cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint)")
    val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc, col("user_id").asc)
    events
      .select(col("event_type"), col("user_id"))
      .distinct()
      .withColumn("h", h)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("event_type"), col("rank"), col("user_id"), col("h"))
  }

  /** Robust outlier detection per group via median absolute deviation:
    * med = median(x), mad = median(|x − med|), outlier ⇔ |x − med| >
    * `madK`·mad — the rank-based alternative to z-scores that one huge
    * value cannot poison. Three grouped passes (median → MAD → flag
    * count), each joining the tiny per-group stats back via broadcast.
    * Inputs are floor-dollar integers (not cents: Spark's exact
    * `percentile` buffers a value→count map, and the dollar grid keeps
    * it ~100× smaller under mostly-distinct prices), and exact
    * `percentile` midpoints are integers or exact .5 halves, so every
    * comparison is bit-exact cross-engine. At 100 TB the exact per-group
    * sort inside `percentile` gives way to `approx_percentile`
    * (validated against the exact path by [[approxPercentileCheck]]);
    * the three-pass join shape is unchanged.
    */
  /** PINNED (l_returnflag, floor-dollar extendedprice) → count
    * distribution — the compressed value histogram both percentile
    * consumers ([[madOutliers]], [[equalFreqBins]]) run over. Bounded
    * by the value grid × flags, not the row count, so the pin is a few
    * thousand rows at any corpus size; a production deployment
    * materializes this histogram once per snapshot and serves every
    * robust-stats pass from it.
    */
  private def dollarDist(lineitem: DataFrame): DataFrame =
    Views.pinned(lineitem, "dollarDistByFlag")(
      _.select(
        col("l_returnflag"),
        expr(s"${Stages.centsSql("l_extendedprice")} div 100").as("x"))
        .groupBy(col("l_returnflag"), col("x"))
        .agg(count(lit(1)).as("cnt")))

  def madOutliers(lineitem: DataFrame, madK: Int = 10): DataFrame = {
    // one map-combined shuffle compresses the facts to a (group, value) →
    // count distribution; every later pass — both percentile rounds and
    // the outlier count — runs over the distribution with `percentile`'s
    // frequency argument, never re-scanning the facts. At 100 TB the
    // distribution is bounded by the value grid, not the row count.
    val dist = dollarDist(lineitem)
    val med = dist
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(x, 0.5, cnt)").as("med"))
    val mad = dist
      .join(broadcast(med), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("med"))
      .agg(expr("percentile(abs(x - med), 0.5, cnt)").as("mad"))
    dist
      .join(broadcast(mad), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("med"), col("mad"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(abs(col("x") - col("med")) > col("mad") * madK, col("cnt")).otherwise(0L))
          .as("n_outliers"))
      .select(
        col("l_returnflag"),
        col("med").as("median_dollars"),
        col("mad").as("mad_dollars"),
        col("n_rows"),
        col("n_outliers"))
  }

  /** Per-row standardization (z-score feature normalization) from exact
    * integer sufficient statistics: z = (x − sx/n) / sqrt(sxx/n −
    * (sx/n)²) — (x − μ)/σ_pop over exact BIGINT moments, the same
    * order-independent trick as [[sufficientStatsCorr]], so the doubles
    * are bit-identical on any engine (built-in `stddev` is
    * partition-order nondeterministic). The closed form divides BEFORE
    * multiplying (σ² = sxx/n − μ², never n·sxx − sx²): the product form
    * overflows BIGINT once n·sxx passes 2⁶³ — which real data hits at
    * ~600k rows of 5-digit dollars, exactly the kind of bug that only
    * appears at 10× the test scale.
    * Shape: one grouped moment pass (map-combined, 3-column shuffle) +
    * one broadcast join back to the fact rows — the standard two-pass
    * normalizer a feature pipeline runs before training; no window, no
    * second shuffle of the facts.
    */
  def zscoreNormalize(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
      col("l_orderkey"),
      col("l_linenumber"),
      col("l_returnflag"),
      expr(s"${Stages.centsSql("l_extendedprice")} div 100").as("x"))
    val moments = base
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    base
      .join(broadcast(moments), Seq("l_returnflag"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_returnflag"),
        col("x"),
        expr(Stages.zscoreSql).as("z"))
  }

  /** Exact per-group median and deterministic mode over the value
    * DISTRIBUTION, not the raw rows: facts aggregate once to
    * (group, value) → count, the median runs `percentile` with the count
    * as frequency weight, and the mode is the (count DESC, value ASC)
    * head of the same distribution — ties break toward the smallest
    * value, so the answer is unique on any engine. At 100 TB the
    * distribution (bounded by the value domain) is the only thing that
    * shuffles twice; the facts shuffle once.
    */
  def medianMode(lineitem: DataFrame): DataFrame = {
    val dist = lineitem
      .select(col("l_returnflag"), expr("CAST(round(l_quantity) AS BIGINT)").as("q"))
      .groupBy(col("l_returnflag"), col("q"))
      .agg(count(lit(1)).as("n"))
    val med = dist
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(q, 0.5, n)").as("median_qty"))
    val mode = dist
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("n").desc, col("q").asc)))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("q").as("mode_qty"), col("n").as("mode_n"))
    med.join(mode, Seq("l_returnflag"))
  }

  /** Deterministic weighted sampling (A-RES with the uniform replaced by
    * an md5-derived hash): priority = hash / weight, and the k SMALLEST
    * priorities per stratum win — heavier rows draw proportionally
    * smaller priorities, membership is a pure function of the key. Both
    * factors are exact in binary64 (hash < 2³², weight a small int), so
    * the IEEE quotient is bit-identical on any engine. Map-side priority,
    * one per-stratum top-k — the training-mix "sample by document
    * quality/length" pass with zero rand() and zero extra shuffles.
    */
  def weightedSample(documents: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("priority").asc, col("doc_id").asc)
    documents
      .select(
        col("source"),
        col("doc_id"),
        col("n_chars"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)" +
          " / CAST(n_chars AS DOUBLE)").as("priority"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"), col("priority"))
  }

  /** Per-group quota cap — the corpus-curation "at most N documents per
    * source/domain" pass: rows rank inside their group by an md5-derived
    * pseudo-random (but fully deterministic) order and only the first
    * `cap` survive. The `row_number() <= cap` shape gets WindowGroupLimit
    * rank pushdown, so each partition forwards at most `cap` rows per
    * group to the shuffle — the 100 TB cost is the group count, not the
    * corpus size.
    */
  def quotaSample(documents: DataFrame, cap: Int): DataFrame = {
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("h").asc, col("doc_id").asc)
    documents
      .select(
        col("source"),
        col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= cap)
      .select(col("source"), col("rank"), col("doc_id"))
  }

  /** EXACT global ranking over a total order WITHOUT a single-partition
    * window: range-repartition on the sort key (the same distributed
    * machinery as a global sort), sort within partitions, then assign
    * rank = partition offset + local index, where the offsets come from
    * one per-partition count pass (Spark's own zipWithIndex — the one
    * sanctioned RDD drop-down: a genuinely per-partition imperative
    * index). A `row_number() OVER (ORDER BY …)` moves the corpus to ONE
    * partition; this shape keeps every stage parallel and produces
    * bit-identical ranks because the sort key is a total order.
    */
  def scalableGlobalRank(df: DataFrame, sortCols: org.apache.spark.sql.Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 2)
    val ranged = df.repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType, false))
    val withIdx = ranged.rdd
      .zipWithIndex()
      .map { case (row, idx) => org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L)) }
    spark.createDataFrame(withIdx, schema)
  }

  /** EXACT global running sum over a total order WITHOUT a corpus-scale
    * single-partition window — the two-level (blocked) prefix sum:
    *
    *   1. [[scalableGlobalRank]] assigns the global rank (all stages
    *      parallel);
    *   2. rows bucket into fixed-size blocks of 2²⁰ ranks; per-block sums
    *      aggregate map-side, and ONLY the block-sum table (corpus/2²⁰
    *      rows — a 10⁶× compression, so an effectively-bounded input)
    *      takes a constant-key running-sum window to become block offsets;
    *   3. offsets broadcast-join back and each block computes its local
    *      running sum under a per-block window — ≤2²⁰ rows per partition,
    *      all blocks in parallel.
    *
    * Produces `rank` and `cum` (= running sum of `valueCol` in rank
    * order), bit-identical to `SUM() OVER (ORDER BY …)` because the sort
    * is a total order and the values are exact integers.
    */
  def scalableCumSum(df: DataFrame, valueCol: String, sortCols: org.apache.spark.sql.Column*): DataFrame = {
    val block = 1L << 20
    // cacheT: the ranked frame feeds BOTH the block-offset aggregate and
    // the probe side of the offset join. Uncached, the range-shuffle +
    // zipWithIndex pipeline would materialize twice per query — and,
    // worse than the wasted work, rank consistency between the two
    // materializations would silently depend on `sortCols` being a
    // TOTAL order (ties could land different ranks per materialization
    // under differing post-shuffle arrival order). One materialization
    // removes that hazard entirely; callers should still pass a total
    // order so the ranks themselves are deterministic.
    val ranked = scalableGlobalRank(df, sortCols: _*)
      .withColumn("_blk", expr(s"(rank - 1) div ${block}L"))
      .cacheT()
    val offsets = ranked
      .groupBy(col("_blk"))
      .agg(sum(col(valueCol)).as("_bsum"))
      .withColumn(
        "_off",
        coalesce(
          sum(col("_bsum")).over(
            Window.partitionBy(lit(1)).orderBy(col("_blk").asc)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_blk"), col("_off"))
    ranked
      .join(broadcast(offsets), Seq("_blk"))
      .withColumn(
        "cum",
        col("_off") + sum(col(valueCol)).over(
          Window.partitionBy(col("_blk")).orderBy(col("rank").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_blk", "_off")
  }

  /** One-pass data-quality profile — the schema-health scan a pipeline
    * runs before training: row/null/distinct tallies and time bounds in
    * a single aggregate over one corpus scan (distincts partial-combine;
    * nothing shuffles but the aggregation state).
    */
  def profileEvents(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_rows"),
      count(col("value")).as("n_value_nonnull"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      min(col("ts")).cast("long").as("min_ts_epoch"),
      max(col("ts")).cast("long").as("max_ts_epoch"),
      sum(expr(Stages.centsSql("value"))).as("total_cents"))

  /** 2-D histogram (hundred-dollar price × ten-unit quantity bins) —
    * the heatmap/joint-distribution aggregation: two integer floor
    * divisions bin map-side, one grouped count. Bin count is bounded by
    * the value domains, not the corpus.
    */
  def histogram2d(lineitem: DataFrame): DataFrame =
    lineitem
      .select(
        expr(s"${Stages.centsSql("l_extendedprice")} div 10000").as("price_bin"),
        expr("CAST(round(l_quantity) AS BIGINT) div 10").as("qty_bin"))
      .groupBy(col("price_bin"), col("qty_bin"))
      .agg(count(lit(1)).as("n"))

  /** 2-D Pareto skyline (price, quantity maxima) in two bounded stages:
    * stage 1 compresses the corpus to one max-quantity row per price
    * DOLLAR (a grouped aggregate on the grid — the same ~100× value
    * compression the percentile family uses); stage 2 runs the
    * dominance filter as a running max over the grid-bounded survivors
    * (constant partition key — the window input is |price grid|, never
    * the corpus). A point survives iff its quantity beats every
    * higher-priced point's.
    */
  def skyline(lineitem: DataFrame): DataFrame = {
    val perX = lineitem
      .select(
        expr(s"${Stages.centsSql("l_extendedprice")} div 100").as("price_dollars"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
      .groupBy(col("price_dollars"))
      .agg(max(col("qty")).as("max_qty"))
    val w = Window
      .partitionBy(lit(1))
      .orderBy(col("price_dollars").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perX
      .withColumn("prev_max", max(col("max_qty")).over(w))
      .filter(col("prev_max").isNull || col("prev_max") < col("max_qty"))
      .select(col("price_dollars"), col("max_qty").as("qty"))
  }

  /** Bitmap-index build over 32-bit words — the OLAP bitmap/roaring
    * container construction: users bucket into word_id = id div 32 and
    * OR their bit map-side (`bit_or` partial-aggregates like any sum),
    * so the shuffle carries |types|·|words| words, not |rows| events.
    * 32-bit words keep every value positive in BIGINT on any engine
    * (bit 63 overflows checked signed arithmetic). `bit_count` reads
    * cardinality straight off the word.
    */
  def bitmapIndex(events: DataFrame): DataFrame =
    events
      // floor-mod bit + exact-pair word: a NEGATIVE id under the old
      // `id div 32` / `id % 32` spelling made Spark's shiftleft mask the
      // -3 amount to bit 61 (silent garbage) where DuckDB's `<<` throws
      // (extreme-fixture sweep, r10). `((id % 32) + 32) % 32` is the
      // same non-negative bit on both engines (both %s take the
      // dividend's sign), and (id - bit) is exactly divisible so the
      // word is floor-consistent too. Non-negative ids are bit-for-bit
      // the old arithmetic.
      .select(
        col("event_type"),
        expr("(user_id - ((user_id % 32) + 32) % 32) div 32").as("word_id"),
        expr("shiftleft(1L, CAST(((user_id % 32) + 32) % 32 AS INT))").as("bit"))
      .groupBy(col("event_type"), col("word_id"))
      .agg(expr("bit_or(bit)").as("bits"))
      .withColumn("n_users", expr("CAST(bit_count(bits) AS BIGINT)"))

  /** Deterministic round-robin interleave of sources — the curriculum
    * mixer of a training pipeline: document i of source s lands at
    * global position (i−1)·|S| + idx(s), so consecutive positions cycle
    * through the sources. The position is ARITHMETIC, not a global sort:
    * the only window is the per-source rank (one shuffle on source), the
    * source→index map is a broadcast-sized dimension, and the output
    * order is total because (rank, source) is unique. At 100 TB there is
    * no global ordering bottleneck anywhere in the plan: the per-source
    * rank is the blocked two-level shape (the [[scalableCumSum]] idea,
    * per group) — local rank inside (source, 2²⁰-wide doc_id block)
    * partitions, ≤2²⁰ rows each, plus per-source block offsets from an
    * aggregate-bounded running count — so even a source owning most of
    * the corpus never sorts inside one task.
    */
  def interleaveSources(documents: DataFrame): DataFrame = {
    val srcIdx = documents
      .select(col("source"))
      .distinct()
      .withColumn(
        "src_idx",
        (row_number().over(Window.partitionBy(lit(1)).orderBy(col("source"))) - 1).cast("long"))
    val nDf = srcIdx.agg(count(lit(1)).as("n_sources"))
    val block = 1L << 20
    val base = documents
      .select(col("doc_id"), col("source"))
      .withColumn("_blk", expr(s"doc_id div ${block}L"))
    val offsets = base
      .groupBy(col("source"), col("_blk"))
      .agg(count(lit(1)).as("_c"))
      .withColumn(
        "_off",
        sum(col("_c")).over(
          Window.partitionBy(col("source")).orderBy(col("_blk").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("_c"))
      .select(col("source"), col("_blk"), col("_off"))
    base
      .withColumn(
        "_j",
        row_number()
          .over(Window.partitionBy(col("source"), col("_blk")).orderBy(col("doc_id").asc))
          .cast("long"))
      .join(broadcast(offsets), Seq("source", "_blk"))
      .withColumn("src_rank", col("_off") + col("_j"))
      .join(broadcast(srcIdx), Seq("source"))
      .crossJoin(broadcast(nDf))
      .select(
        col("doc_id"),
        col("source"),
        col("src_rank"),
        ((col("src_rank") - 1) * col("n_sources") + col("src_idx")).as("global_pos"))
  }

  /** First event per (user, event_type) — first-touch attribution, the
    * dual of [[latestByKey]]: ONE aggregation with `min_by` on the
    * (ts, event_id) struct order, map-side combined, so only |keys| rows
    * per partition reach the shuffle (never a corpus-wide window sort).
    */
  def firstTouch(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min_by(
          struct(col("event_id"), col("ts"), col("value")),
          struct(col("ts"), col("event_id"))).as("first"))
      .select(
        col("user_id"),
        col("event_type"),
        col("first.event_id").as("event_id"),
        col("first.ts").as("ts"),
        col("first.value").as("value"))

  /** Ratio-to-report (share of grand total) per group WITHOUT a window:
    * one grouped integer-cents aggregate, the grand total re-aggregated
    * from the group sums (|groups| rows) and broadcast back — a
    * corpus-wide `sum() OVER ()` window would move everything to one
    * partition. Both operands are exact integers < 2⁵³, so the one IEEE
    * division matches any engine.
    */
  def shareOfTotal(lineitem: DataFrame): DataFrame = {
    val g = lineitem
      .groupBy(col("l_returnflag"))
      .agg(sum(expr(Stages.centsSql("l_extendedprice"))).as("cents"))
    val t = g.agg(sum(col("cents")).as("total_cents"))
    g.crossJoin(broadcast(t))
      .select(
        col("l_returnflag"),
        expr("cents / CAST(100 AS DOUBLE)").as("revenue"),
        expr("cents / CAST(total_cents AS DOUBLE)").as("share"))
  }

  /** Snowflake-chain star join: facts → orders → customer → nation →
    * region, aggregated by region name. The two small dimensions are
    * explicit broadcasts; the orders/customer joins shuffle on their
    * keys and Catalyst (+AQE) reorders/plans the chain. Revenue is the
    * exact integer discount arithmetic of [[starRevenueTopK]].
    */
  def snowflakeRevenue(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame =
    lineitem
      .withColumn(
        "rev_units",
        expr(
          s"${Stages.centsSql("l_extendedprice")} * (100 - ${Stages.centsSql("l_discount")})"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        expr("sum(rev_units) / CAST(10000 AS DOUBLE)").as("revenue"))

  /** Correlated scalar subqueries — orders whose price exceeds 2× their
    * own customer's average, written as two correlated aggregates and
    * left to Catalyst's decorrelation (RewriteCorrelatedScalarSubquery
    * turns each into an aggregate + left outer join; `.explain` shows no
    * per-row subquery execution). The predicate compares
    * cents·count > 2·sum(cents) — all integers, no division — so the
    * oracle matches exactly.
    */
  def correlatedAboveAvg(spark: SparkSession, orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("graft_corr_orders")
    spark.sql(
      s"""SELECT o_orderkey, o_custkey,
                 ${Stages.centsSql("o_totalprice")} / CAST(100 AS DOUBLE) AS total_price
          FROM graft_corr_orders o
          WHERE ${Stages.centsSql("o_totalprice")} *
                (SELECT count(*) FROM graft_corr_orders i WHERE i.o_custkey = o.o_custkey)
              > 2 * (SELECT sum(${Stages.centsSql("i.o_totalprice")})
                     FROM graft_corr_orders i WHERE i.o_custkey = o.o_custkey)""")
  }

  /** Multi-rule data-quality audit in ONE corpus scan: every rule is a
    * conditional sum inside a single aggregate (map-side combined), and
    * the per-rule report rows are exploded from that one result row with
    * `stack` — no per-rule scans, no shuffle beyond the aggregation's
    * single-row exchange. A rule that fires zero times still emits its
    * row (an absent rule is indistinguishable from a broken probe).
    * Fixtures carry no nulls, so the null-value rule observes an in-plan
    * synthesized nullable column (`event_id % 7`), mirrored verbatim in
    * the oracle. Time math is integer epoch seconds (engine-portable).
    */
  /** Lifecycle-stage census: users quadrant by recency vs frequency
    * against the corpus medians (exact interpolated percentiles over the
    * per-user table, broadcast back as two scalars). Core = recent and
    * frequent; casual = recent only; lapsing = frequent only; dormant =
    * neither. |stages| output rows; two aggregates and a broadcast.
    */
  def lifecycleStages(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), expr("CAST(ts AS LONG)").as("ts_sec"))
    val anchor = base.agg(max(col("ts_sec")).as("now_sec"))
    val perUser = base
      .crossJoin(broadcast(anchor))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("freq"),
        expr("(max(now_sec) - max(ts_sec)) div 86400").as("recency_days"))
    val medians = perUser.agg(
      expr("percentile(recency_days, 0.5)").as("med_r"),
      expr("percentile(freq, 0.5)").as("med_f"))
    perUser
      .crossJoin(broadcast(medians))
      .select(
        expr("""CASE
                  WHEN recency_days <= med_r AND freq >= med_f THEN 'core'
                  WHEN recency_days <= med_r THEN 'casual'
                  WHEN freq >= med_f THEN 'lapsing'
                  ELSE 'dormant'
                END""").as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Pareto concentration of part revenue: cumulative share captured by
    * the top-1/5/10/20/50/100 parts. The global ordering comes from
    * [[scalableGlobalRank]] (descending revenue); the cumulative window
    * then runs over the ≤100-row prefix only, and the grand total rides
    * in as a broadcast scalar.
    */
  def paretoParts(lineitem: DataFrame, maxRank: Int = 100): DataFrame = {
    val revenue = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(expr(Stages.centsSql("l_extendedprice"))).as("cents"))
    val total = revenue.agg(sum(col("cents")).as("total_cents"))
    val ranked = scalableGlobalRank(revenue, col("cents").desc, col("l_partkey").asc)
      .filter(col("rank") <= maxRank)
      // no-op limit (the filter already bounds to maxRank rows): makes the
      // boundedness visible in the physical plan so the prefix window
      // below is provably not corpus-scale
      .limit(maxRank)
    ranked
      .withColumn(
        "cum_cents",
        sum(col("cents")).over(
          Window.partitionBy(lit(1)).orderBy(col("rank"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rank").isin(1L, 5L, 10L, 20L, 50L, 100L))
      .crossJoin(broadcast(total))
      .select(
        col("rank"), col("l_partkey"), col("cents"), col("cum_cents"),
        expr("CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)").as("cum_share"))
  }

  /** Row-level table reconciliation — the data-diff between a table and
    * its (in-plan synthesized) drifted copy: keys only in A, only in B,
    * matched-but-changed, and matched-identical, from ONE full outer
    * join on the key comparing md5 row fingerprints. The drift is
    * deterministic (drop keys ≡ 0 mod 101, perturb prices ≡ 0 mod 97,
    * append nothing), mirrored in the oracle.
    */
  def tableDiff(orders: DataFrame): DataFrame = {
    def fp(priceExpr: String) =
      expr(s"""md5(concat_ws('|', CAST(o_orderkey AS STRING), o_orderstatus,
               CAST($priceExpr AS STRING)))""")
    val a = orders.select(
      col("o_orderkey").as("k"),
      fp(Stages.centsSql("o_totalprice")).as("fp_a"))
    val b = orders
      .filter(expr("o_orderkey % 101 != 0"))
      .select(
        col("o_orderkey").as("k"),
        fp(s"${Stages.centsSql("o_totalprice")} + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END")
          .as("fp_b"))
    a.join(b, Seq("k"), "full_outer")
      .agg(
        sum(when(col("fp_b").isNull, 1L).otherwise(0L)).as("n_only_a"),
        sum(when(col("fp_a").isNull, 1L).otherwise(0L)).as("n_only_b"),
        sum(when(col("fp_a").isNotNull && col("fp_b").isNotNull &&
          col("fp_a") =!= col("fp_b"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("fp_a") === col("fp_b"), 1L).otherwise(0L)).as("n_same"))
  }

  /** Sampling-accuracy report: the exact median against the median of a
    * deterministic 10 % hash sample, per event type — what a pipeline
    * pays in accuracy for sampled percentiles. Both medians are exact
    * interpolated percentiles; the error is integer-scaled cents.
    */
  def sampleAccuracy(events: DataFrame): DataFrame = {
    val base = events.select(
      col("event_type"),
      expr(Stages.centsSql("value")).as("cents"),
      // the file's md5 sampling idiom — the previous multiplicative
      // spelling was a no-op mod 10 (2654435761 ≡ 1 mod 10), i.e. a
      // systematic last-decimal-digit sample, not a hash sample, so the
      // accuracy this query measures was not the hash-sampling cost
      expr("cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % 10").as("h"))
    base
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(cents, 0.5)").as("p50_full"),
        sum(when(col("h") === 0L, 1L).otherwise(0L)).as("n_sample"),
        expr("percentile(CASE WHEN h = 0 THEN cents END, 0.5)").as("p50_sample"))
      .withColumn("abs_err", expr("abs(p50_sample - p50_full)"))
  }

  /** Recency-weighted engagement score with EXACT arithmetic: per event,
    * weight 2^(5−age_weeks) in 32nds (integer — halving decay, zero past
    * five weeks), so the per-user accumulation is a BIGINT sum and the
    * only double appears in the final /32. Age anchors to the corpus
    * max timestamp (broadcast 1-row).
    */
  def recencyScore(events: DataFrame): DataFrame = {
    val base = events.select(
      col("user_id"),
      expr("CAST(ts AS LONG)").as("ts_sec"),
      expr(Stages.centsSql("value")).as("cents"))
    val anchor = base.agg(max(col("ts_sec")).as("now_sec"))
    base
      .crossJoin(broadcast(anchor))
      .withColumn("age_weeks", expr("(now_sec - ts_sec) div 604800"))
      .withColumn(
        "w32",
        expr("CASE WHEN age_weeks > 5 THEN 0 ELSE 32 div (1 << CAST(age_weeks AS INT)) END"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents") * col("w32")).as("score_32nds"))
      .withColumn("score", expr("CAST(score_32nds AS DOUBLE) / 32.0"))
  }

  /** Null-safe equality semantics report: how many DISTINCT key values
    * two tables share under `=` versus `<=>` (IS NOT DISTINCT FROM).
    * Nullable keys are synthesized in-plan on both sides (fixtures carry
    * none); the comparison runs over the two distinct key SETS (≤ the
    * key-domain size, broadcast-joined), so the null–null cross product
    * that makes row-level `<=>` joins explode never materializes.
    */
  def nullSafeJoinReport(events: DataFrame, orders: DataFrame): DataFrame = {
    val aKeys = events
      .select(expr("CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_id % 100 END").as("k"))
      .distinct()
    val bKeys = orders
      .select(expr("CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderkey % 100 END").as("k"))
      .distinct()
    val eq = aKeys.join(bKeys.withColumnRenamed("k", "k2"), col("k") === col("k2"))
      .agg(count(lit(1)).as("matched_eq"))
    val ns = aKeys.join(bKeys.withColumnRenamed("k", "k2"), col("k") <=> col("k2"))
      .agg(count(lit(1)).as("matched_nullsafe"))
    aKeys.agg(count(lit(1)).as("n_keys_a"), sum(col("k").isNull.cast("long")).as("n_null_a"))
      .crossJoin(bKeys.agg(count(lit(1)).as("n_keys_b")))
      .crossJoin(eq)
      .crossJoin(ns)
  }

  /** Fulfillment-latency SLA report: days from order to line shipment,
    * exact interpolated percentiles per order priority. The join keys
    * both corpus tables on orderkey (co-partitioned shuffle join — the
    * canonical fact-to-fact TPC-H shape) and day math is integer
    * end to end.
    */
  def shipLatency(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey"), expr("CAST(l_shipdate AS LONG)").as("ship_sec"))
      .join(
        orders.select(
          col("o_orderkey"), col("o_orderpriority"),
          expr("CAST(o_orderdate AS LONG)").as("order_sec")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_orderpriority"),
        expr("(ship_sec - order_sec) div 86400").as("days"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        expr("percentile(days, 0.5)").as("p50_days"),
        expr("percentile(days, 0.95)").as("p95_days"),
        expr("percentile(days, 0.99)").as("p99_days"),
        max(col("days")).as("max_days"))

  /** Multi-hot encoding of each user's event-type set as an integer
    * bitmask (fixed CASE mapping — engine-portable, no hash), then the
    * histogram of masks: which behavior combinations exist and how
    * common they are. `sum(DISTINCT bit)` folds the set map-side;
    * bit_count recovers the set size. 2^|types| output rows max.
    */
  def multihotEncode(events: DataFrame): DataFrame =
    events
      .select(
        col("user_id"),
        expr("""CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                WHEN 'view' THEN 16 ELSE 32 END""").as("bit"))
      .groupBy(col("user_id"))
      .agg(sum_distinct(col("bit")).as("mask"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("n_types", expr("bit_count(mask)").cast("long"))
      .select(col("mask"), col("n_types"), col("n_users"))

  /** Sample-ratio-mismatch check for the [[Analytics.abTest]] split: if
    * the deterministic 50/50 assignment drifted, the experiment is
    * invalid before any metric is read. χ² = (n1−n2)²/(n1+n2) on exact
    * distinct-user counts; flag at the 95 % critical value 3.84. One
    * distinct aggregate, 1-row output.
    */
  def srmCheck(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), expr("user_id % 2").as("variant"))
      .distinct()
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n2"))
      .select(
        col("n1"), col("n2"),
        expr("""CAST((n1 - n2) * (n1 - n2) AS DOUBLE)
                / nullif(CAST(n1 + n2 AS DOUBLE), 0.0E0)""").as("chi2"))
      .withColumn("flagged", (col("chi2") > 3.84).cast("long"))

  /** Quantile (rank) normalization of order value — the monotone
    * transform that makes a feature uniform on [0,1]: qt = (rank−1)/
    * (n−1) over the total order (value, key). Rank comes from
    * [[scalableGlobalRank]] — range partition + per-partition offsets,
    * no single-partition window — and n rides in as a broadcast scalar,
    * so the transform holds its shape at any corpus size.
    */
  def quantileTransform(orders: DataFrame): DataFrame = {
    // cacheT, per scalableCumSum's documented rule for this exact
    // pattern: the ranked frame feeds BOTH the n aggregate and the
    // transform — uncached, the range-shuffle + zipWithIndex pipeline
    // would materialize twice per run
    val ranked = scalableGlobalRank(
      orders.select(
        expr(Stages.centsSql("o_totalprice")).as("cents"), col("o_orderkey")),
      col("cents").asc, col("o_orderkey").asc)
      .cacheT()
    ranked
      .crossJoin(broadcast(ranked.agg(max(col("rank")).as("n"))))
      .select(
        col("o_orderkey"), col("cents"),
        // single-row input: (rank−1)/(n−1) is 0/0 — NULL via the lazy
        // integer CASE (Spark ANSI throws on the double division where
        // DuckDB yields NaN); one row has no quantile position
        expr("CASE WHEN n = 1 THEN NULL ELSE CAST(rank - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END")
          .as("qt"))
  }

  /** Join-key skew diagnostics — the report that decides salting and
    * broadcast thresholds BEFORE a shuffle join runs at corpus scale:
    * per candidate key, the frequency distribution of the key (distinct
    * count, max, exact p50/p99) and the max/median skew ratio. Each
    * profile is two map-combined aggregates; the per-key frequency table
    * is the only shuffle.
    */
  def skewReport(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    def profile(df: DataFrame, keyCol: String, name: String): DataFrame =
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("f"))
        .agg(
          lit(name).as("key_col"),
          count(lit(1)).as("n_keys"),
          max(col("f")).as("max_freq"),
          expr("percentile(f, 0.5)").as("p50_freq"),
          expr("percentile(f, 0.99)").as("p99_freq"))
    profile(lineitem, "l_orderkey", "lineitem.l_orderkey")
      .union(profile(orders, "o_custkey", "orders.o_custkey"))
      .withColumn("skew", expr("CAST(max_freq AS DOUBLE) / p50_freq"))
  }

  /** Survivorship merge — the golden-record step after dedup finds a
    * cluster: within each (user, type, day) cell the survivor is the
    * latest event (event_id tie-break) and the merged record carries the
    * cell's aggregates. ONE partitioned-window pass computes the rank
    * AND the cell aggregates (count/max as window functions over the
    * same partition), so the corpus shuffles once and no self-join back
    * onto the cell is needed.
    */
  def survivorship(events: DataFrame): DataFrame = {
    val base = events.select(
      col("user_id"), col("event_type"),
      expr("CAST(ts AS LONG) div 86400").as("day"),
      col("event_id"),
      expr("CAST(ts AS LONG)").as("ts_sec"),
      expr(Stages.centsSql("value")).as("cents"))
    val cell = Window.partitionBy(col("user_id"), col("event_type"), col("day"))
    val w = cell.orderBy(col("ts_sec").desc, col("event_id").asc)
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("n_merged", count(lit(1)).over(cell))
      .withColumn("max_cents", max(col("cents")).over(cell))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_type"), col("day"),
        col("event_id").as("survivor_id"),
        col("n_merged"), col("max_cents"))
  }

  /** Order-independent table fingerprint — the data-diff primitive for
    * comparing a table across systems without sorting it: each row
    * hashes (md5 over a canonical integer-text rendering) to a 16-bit
    * word, and the fingerprint is (count, Σword, min, max). 16-bit words
    * keep the BIGINT sum exact past 10¹³ rows; every piece is
    * commutative, so partition order — and engine — cannot change it.
    */
  def tableChecksum(lineitem: DataFrame): DataFrame =
    lineitem
      .select(expr(
        s"""CAST(conv(substring(md5(concat_ws('|',
             CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING),
             l_returnflag, l_linestatus,
             CAST(${Stages.centsSql("l_extendedprice")} AS STRING))), 1, 4), 16, 10)
           AS BIGINT)""").as("word"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("word")).as("word_sum"),
        min(col("word")).as("min_word"),
        max(col("word")).as("max_word"))

  /** Partition-balance report for a prospective hash partitioning: rows
    * per bucket under the repo's md5 key hash, with each bucket's
    * deviation from the uniform share. 32 output rows regardless of
    * corpus size; one map-combined aggregate. (The previous
    * multiplicative spelling depended only on user_id's low 5 bits —
    * an odd multiplier is a bijection mod 32 — so the audit was a
    * relabeled user_id%32 histogram that could never detect imbalance.)
    */
  def partitionBalance(events: DataFrame, buckets: Int = 32): DataFrame = {
    val counts = events
      .groupBy(
        expr(s"cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint) % $buckets")
          .as("bucket"))
      .agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("total"))))
      .select(
        col("bucket"), col("n"),
        expr(s"CAST(n AS DOUBLE) * $buckets / CAST(total AS DOUBLE)").as("balance"))
  }

  /** Exact percentiles at every ROLLUP level — subtotal and grand-total
    * rows carry the percentile of their WHOLE stratum, not an average of
    * child percentiles (which would be wrong: quantiles don't compose).
    * Spark evaluates the multi-level aggregate in one pass via grouping
    * sets; integer-cents input keeps the interpolation bit-exact.
    */
  def rollupPercentiles(lineitem: DataFrame): DataFrame = {
    val cents = Stages.centsSql("l_extendedprice")
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        expr(s"percentile($cents, 0.5)").as("p50_cents"),
        expr(s"percentile($cents, 0.95)").as("p95_cents"))
  }

  /** Rare-category collapse — the cardinality-control step before
    * one-hot/target encoding: a fine category is synthesized in-plan
    * (type × id-residue, mirrored in the oracle), and categories holding
    * under 1 % of the corpus fold into 'other'. The share test is
    * integer (`cnt·100 < total`), so the cut is scale-invariant and
    * engine-exact; two map-combined aggregates plus a 1-row broadcast.
    */
  def rareCollapse(events: DataFrame): DataFrame = {
    val cat = expr("concat(event_type, '_', CAST(event_id % 13 AS STRING))")
    val counts = events.select(cat.as("cat")).groupBy(col("cat"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts
      .crossJoin(broadcast(total))
      .withColumn(
        "final_cat",
        when(col("cnt") * 100 < col("total"), lit("other")).otherwise(col("cat")))
      .groupBy(col("final_cat"))
      .agg(sum(col("cnt")).as("n_events"), count(lit(1)).as("n_src_cats"))
  }

  /** Smoothed target (mean) encoding of a synthesized category against a
    * high-value label: te = (pos + m·prior) / (n + m), the m-estimate
    * that shrinks small categories toward the global rate. Counts are
    * exact integers; prior and te are two fixed-order divisions, so the
    * doubles match any engine bitwise. One aggregate over the corpus
    * plus a broadcast 1-row prior.
    */
  def targetEncoding(events: DataFrame, m: Int = 10): DataFrame = {
    val cat = expr("concat(event_type, '_', CAST((CAST(ts AS LONG) div 3600) % 4 AS STRING))")
    val pos = when(col("value") > 100.0, 1L).otherwise(0L)
    val perCat = events
      .select(cat.as("category"), pos.as("pos"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
    val prior = perCat.agg(
      sum(col("n")).as("tn"), sum(col("n_pos")).as("tp"))
    perCat
      .crossJoin(broadcast(prior))
      .select(
        col("category"), col("n"), col("n_pos"),
        expr("CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)").as("prior"),
        expr(s"""(CAST(n_pos AS DOUBLE) + $m * (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)))
                 / CAST(n + $m AS DOUBLE)""").as("te"))
  }

  /** Pairwise audience overlap between event types: Jaccard of the user
    * sets for every type pair. The distinct (type, user) projection
    * shuffles once; the self-join co-partitions on user_id and fans out
    * at most |types|² rows per user (bounded by a constant, not the
    * corpus), and the |types|-row size table broadcasts back on.
    */
  def audienceOverlap(events: DataFrame): DataFrame = {
    val tu = events.select(col("event_type"), col("user_id")).distinct()
    val sizes = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    tu.as("a")
      .join(
        tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(
        col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(
        broadcast(sizes.select(col("event_type").as("type_a"), col("n").as("n_a"))),
        "type_a")
      .join(
        broadcast(sizes.select(col("event_type").as("type_b"), col("n").as("n_b"))),
        "type_b")
      .select(
        col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_common"),
        expr("CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE)")
          .as("jaccard"))
  }

  /** Per-user feature assembly in ONE aggregate pass — the feature-store
    * materialization a churn model trains on. Every feature is a
    * conditional aggregate inside the same groupBy (recency, frequency,
    * monetary, breadth, tenure), so the corpus shuffles exactly once on
    * user_id and nothing joins; derived ratios are per-row arithmetic
    * afterwards. The N-separate-aggregates-then-join spelling costs N
    * shuffles for identical output.
    */
  def userFeatures(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        countDistinct(expr("CAST(ts AS LONG) div 86400")).as("active_days"),
        min(expr("CAST(ts AS LONG)")).as("first_seen"),
        max(expr("CAST(ts AS LONG)")).as("last_seen"),
        sum(expr(Stages.centsSql("value"))).as("spend_cents"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
      .withColumn("tenure_days", expr("(last_seen - first_seen) div 86400"))
      .withColumn(
        "purchase_ratio",
        expr("CAST(n_purchases AS DOUBLE) / CAST(n_events AS DOUBLE)"))

  /** Windowed-dedup report — the batch analog of streaming
    * `dropDuplicates` under a watermark: events collapse to one per
    * (user, type, hour) cell, keeping per-type raw/kept/dropped tallies.
    * Spelled as two map-combined aggregations, NOT a row_number window:
    * the first groupBy is the dedup itself, so no per-row rank state
    * ever materializes. One shuffle on the cell key.
    */
  def eventDedup(events: DataFrame): DataFrame =
    events
      .groupBy(
        col("user_id"), col("event_type"),
        expr("CAST(ts AS LONG) div 3600").as("hour"))
      .agg(count(lit(1)).as("n_in_cell"))
      .groupBy(col("event_type"))
      .agg(sum(col("n_in_cell")).as("n_raw"), count(lit(1)).as("n_kept"))
      .withColumn("n_dropped", col("n_raw") - col("n_kept"))

  def ruleViolations(events: DataFrame): DataFrame =
    events
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(expr("event_id % 7 = 0"), 1L).otherwise(0L)).as("r_null"),
        sum(when(col("value") < 0.05 || col("value") > 400.0, 1L).otherwise(0L)).as("r_range"),
        sum(when(!col("event_type").isin("click", "view", "purchase", "signup"), 1L)
          .otherwise(0L)).as("r_type"),
        sum(when(expr("CAST(ts AS LONG) < 1704153600"), 1L).otherwise(0L)).as("r_stale"),
        sum(when(!col("props").rlike("^\\{\"k\": [0-9]+\\}$"), 1L).otherwise(0L)).as("r_props"))
      .select(
        expr("""stack(5,
                  'null_value',      r_null,
                  'out_of_range',    r_range,
                  'unknown_type',    r_type,
                  'stale_ts',        r_stale,
                  'malformed_props', r_props) AS (rule, n_violations)"""),
        col("n_rows"))
      .withColumn(
        "violation_rate",
        col("n_violations").cast("double") / col("n_rows").cast("double"))

  /** Zone-map (min/max data-skipping) readout comparing two physical
    * layouts for the same ship-date range predicate: `natural` zones
    * follow the write order (orderkey ranges — the layout you get for
    * free) and `clustered` zones follow the filter column (equal-depth
    * slices of the shipdate-sorted order, via [[scalableGlobalRank]] —
    * what a sort/Z-order compaction buys). A zone is skippable when its
    * [min,max] misses the predicate window entirely; `scan_frac` is the
    * fraction of rows a min/max-pruning scan still reads. Zone stats are
    * one map-side-combined aggregate per layout — the zone table is
    * `zones` rows regardless of corpus size.
    */
  def zoneMapSkipping(lineitem: DataFrame, zones: Int = 64): DataFrame = {
    val lo = "DATE'1998-01-01'"
    val hi = "DATE'1999-01-01'"
    val base = lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      expr("CAST(l_shipdate AS DATE)").as("d"))
    val maxKey = base.agg(max(col("l_orderkey")).as("mk"))
    val natural = base
      .crossJoin(broadcast(maxKey))
      .select(expr(s"l_orderkey * $zones div (mk + 1)").as("zone"), col("d"))
    val n = base.agg(count(lit(1)).as("nr"))
    val clustered = scalableGlobalRank(base, col("d").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .crossJoin(broadcast(n))
      .select(expr(s"(rank - 1) * $zones div nr").as("zone"), col("d"))
    def report(df: DataFrame, layout: String): DataFrame =
      df.groupBy(col("zone"))
        .agg(count(lit(1)).as("zr"), min(col("d")).as("zmin"), max(col("d")).as("zmax"))
        .agg(
          count(lit(1)).as("n_zones"),
          sum(when(expr(s"zmax < $lo OR zmin >= $hi"), 1L).otherwise(0L)).as("n_pruned"),
          sum(col("zr")).as("rows_total"),
          sum(when(expr(s"zmax < $lo OR zmin >= $hi"), 0L).otherwise(col("zr")))
            .as("rows_scanned"))
        .select(
          lit(layout).as("layout"), col("n_zones"), col("n_pruned"),
          col("rows_total"), col("rows_scanned"),
          expr("CAST(rows_scanned AS DOUBLE) / CAST(rows_total AS DOUBLE)").as("scan_frac"))
    report(natural, "natural").unionAll(report(clustered, "clustered"))
  }

  /** k-anonymity risk audit over the quasi-identifier (event_type,
    * $20 value band, day) — the re-identification screen a dataset
    * release runs: how many QI-groups have fewer than `k` members, and
    * what fraction of rows sit in them. One grouped count plus one
    * aggregate over the (domain-bounded) group table; no row-level data
    * leaves the scan.
    */
  def kAnonymity(events: DataFrame, k: Int = 5): DataFrame =
    events
      .select(
        col("event_type"),
        expr(s"${Stages.centsSql("value")} div 2000").as("band"),
        expr("CAST(ts AS DATE)").as("day"))
      .groupBy(col("event_type"), col("band"), col("day"))
      .agg(count(lit(1)).as("gsz"))
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("gsz")).as("min_group"),
        sum(when(col("gsz") < k, 1L).otherwise(0L)).as("n_groups_below_k"),
        sum(when(col("gsz") < k, col("gsz")).otherwise(0L)).as("n_rows_below_k"),
        sum(col("gsz")).as("n_rows"))
      .select(
        col("n_groups"), col("min_group"), col("n_groups_below_k"),
        col("n_rows_below_k"), col("n_rows"),
        expr("CAST(n_rows_below_k AS DOUBLE) / CAST(n_rows AS DOUBLE)").as("risk_frac"))

  /** Goodness-of-fit of the md5 row-partitioner against uniform over
    * 256 buckets — the check behind every hash-partition/sample op in
    * this library: χ² folds to 256·ΣO²/n − n (ΣO² is BIGINT-exact, so
    * no per-bucket float accumulation order exists to disagree on) and
    * the KS sup runs over the full 0..255 bucket grid (empty buckets
    * included via a generated series) with an integer numerator
    * max|256·cumO − n·(b+1)|. Bucket table is 256 rows at any corpus
    * size.
    */
  def hashUniformity(events: DataFrame): DataFrame = {
    val counts = events
      .select(expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 256")
        .as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("o"))
    val grid = events.sparkSession
      .range(1)
      .select(explode(expr("sequence(0, 255)")).as("b"))
      .join(counts, Seq("b"), "left_outer")
      .select(col("b"), coalesce(col("o"), lit(0L)).as("o"))
    val w = Window
      .partitionBy(lit(1))
      .orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = grid.agg(
      sum(col("o")).as("n"),
      sum(when(col("o") > 0, 1L).otherwise(0L)).as("n_buckets_used"),
      sum(col("o") * col("o")).as("sumsq"))
    grid
      .select(col("b"), col("o"), sum(col("o")).over(w).as("cum"))
      .crossJoin(broadcast(tot))
      .agg(
        max(col("n")).as("n"),
        max(col("n_buckets_used")).as("n_buckets_used"),
        max(col("sumsq")).as("sumsq"),
        max(abs(lit(256L) * col("cum") - col("n") * (col("b") + 1L))).as("ks_num"))
      .select(
        col("n"), col("n_buckets_used"),
        expr("(256.0 * CAST(sumsq AS DOUBLE) - CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / nullif(CAST(n AS DOUBLE), 0.0E0)")
          .as("chi2"),
        expr("CAST(ks_num AS DOUBLE) / nullif(256.0 * CAST(n AS DOUBLE), 0.0E0)").as("ks_d"))
  }

  /** Greedy small-file compaction plan: the (day, event_type) "files"
    * (row counts as size proxy) are packed in calendar order into output
    * buckets of ~`targetRows` by flooring the exclusive prefix sum —
    * files are never split, buckets may run over by at most one file,
    * exactly the first-fit-in-order plan a table-maintenance job emits.
    * The file table is domain-bounded (days × types), so the packing
    * window never sees corpus-scale rows.
    */
  def compactionPlan(events: DataFrame, targetRows: Long = 2000L): DataFrame = {
    val files = events
      .select(expr("CAST(CAST(ts AS DATE) AS TIMESTAMP)").as("dts"), col("event_type"))
      .groupBy(expr("CAST(CAST(dts AS LONG) div 86400 AS BIGINT)").as("day"), col("event_type"))
      .agg(count(lit(1)).as("rows"))
    val w = Window
      .partitionBy(lit(1))
      .orderBy(col("day"), col("event_type"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .select(
        col("day"), col("event_type"), col("rows"),
        coalesce(sum(col("rows")).over(w), lit(0L)).as("cum0"))
      .select(
        col("day"), col("event_type"), col("rows"),
        expr(s"cum0 div $targetRows").as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("rows")).as("total_rows"),
        min(col("day")).as("min_day"),
        max(col("day")).as("max_day"))
  }

  /** Ingestion quarantine router: rows whose payload fails the schema
    * contract are counted per failure reason instead of silently
    * nulling downstream — the dead-letter pattern. Corruption is
    * synthesized IN-PLAN (`event_id % 11` appends garbage, `% 13` nulls
    * the payload — the fixtures carry no bad rows), validation is one
    * anchored regex and extraction one regex group (both RE2-safe, no
    * JSON engine dependence), and the good-row payload sum proves the
    * surviving lane still parses. One map-side pass, |reasons| output
    * rows.
    */
  def quarantineRouter(events: DataFrame): DataFrame =
    events
      .select(
        expr("""CASE WHEN event_id % 13 = 0 THEN NULL
                     WHEN event_id % 11 = 0 THEN concat(props, 'x')
                     ELSE props END""").as("p"))
      .select(
        when(col("p").isNull, "null_props")
          .when(!col("p").rlike("^\\{\"k\": [0-9]+\\}$"), "malformed")
          .otherwise("ok").as("reason"),
        regexp_extract(col("p"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
      .groupBy(col("reason"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("reason") === "ok", col("k")).otherwise(0L)).as("k_sum"))

  /** Join-cardinality estimation quality — the optimizer-style readout
    * that tells you whether a 10% key sample can size orders⋈lineitem
    * before running it: the TRUE join cardinality Σ_k n_a(k)·n_b(k)
    * computed from the two per-key count tables (key-grain aggregates —
    * the join itself never materializes), the estimate from keys with
    * md5-hash bucket 0 scaled ×10 (sampling the KEY domain on both
    * sides keeps the per-key product intact, so the estimator is
    * unbiased — row-sampling each side independently would bias the
    * product down), and their ratio. Integer counts; one division.
    */
  def joinCardinalityEstimate(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val bucket =
      "cast(conv(substring(md5(cast(k as string)), 1, 8), 16, 10) as bigint) % 10"
    val oc = orders.groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("na"))
    val lc = lineitem.groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("nb"))
    val joined = oc.join(lc, Seq("k"))
      .select(col("k"), (col("na") * col("nb")).as("pairs"), expr(bucket).as("b"))
    joined
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("pairs")).as("actual_pairs"),
        (sum(when(col("b") === 0, col("pairs")).otherwise(lit(0L))) * 10L).as("est_pairs"))
      .withColumn(
        "ratio", expr("CAST(est_pairs AS DOUBLE) / CAST(actual_pairs AS DOUBLE)"))
  }

  /** Laspeyres / Paasche / Fisher price indices between two order-date
    * years over the parts traded in both: per part-year, exact integer
    * (Σcents, Σqty); the cross-price terms p₁·q₀ and p₀·q₁ are the only
    * rationals, each quantized to cents per part so the cross-part sums
    * run as order-free BIGINTs — while the OWN-price terms need no
    * division at all (p_y·q_y ≡ Σcents_y exactly, the identity that
    * makes half of each index free). Fisher = √(L·P) via one correctly-
    * rounded sqrt. Two map-combined aggregates and a part-grain join.
    */
  def priceIndex(
      orders: DataFrame,
      lineitem: DataFrame,
      year0: String = "1996",
      year1: String = "1997"): DataFrame = {
    def yearAgg(y: String) =
      lineitem
        .join(
          orders.filter(
            col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
              col("o_orderdate") < lit(s"${y.toInt + 1}-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"))
        .agg(
          sum(expr(Stages.centsSql("l_extendedprice"))).as("c"),
          sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("q"))
    val a = yearAgg(year0).select(col("l_partkey"), col("c").as("c0"), col("q").as("q0"))
    val b = yearAgg(year1).select(col("l_partkey"), col("c").as("c1"), col("q").as("q1"))
    a.join(b, Seq("l_partkey"))
      .select(
        col("c0"), col("c1"),
        expr("""CAST(round((CAST(c1 AS DOUBLE) / CAST(q1 AS DOUBLE)) * CAST(q0 AS DOUBLE)) AS BIGINT)""")
          .as("p1q0"),
        expr("""CAST(round((CAST(c0 AS DOUBLE) / CAST(q0 AS DOUBLE)) * CAST(q1 AS DOUBLE)) AS BIGINT)""")
          .as("p0q1"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("c0")).as("sc0"), sum(col("c1")).as("sc1"),
        sum(col("p1q0")).as("sp1q0"), sum(col("p0q1")).as("sp0q1"))
      .select(
        col("n_parts"),
        expr("CAST(sp1q0 AS DOUBLE) / CAST(sc0 AS DOUBLE)").as("laspeyres"),
        expr("CAST(sc1 AS DOUBLE) / CAST(sp0q1 AS DOUBLE)").as("paasche"),
        expr("""sqrt((CAST(sp1q0 AS DOUBLE) / CAST(sc0 AS DOUBLE))
                 * (CAST(sc1 AS DOUBLE) / CAST(sp0q1 AS DOUBLE)))""").as("fisher"))
  }

  private val revUnitsSql = Stages.lineitemRevUnitsSql

  /** TPC-H Q7-shaped volume shipping: bilateral trade between two
    * nations (supplier's nation × customer's nation, both directions)
    * by ship year. Both nation legs broadcast (dimension-sized); the
    * fact table joins once to each key and aggregates to the
    * (nation, nation, year) grid. Revenue in exact integer
    * cents×(100−disc) units, dollars one shared division.
    */
  def nationTrade(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      nationA: String,
      nationB: String): DataFrame = {
    val supp = supplier
      .join(
        broadcast(nation.filter(col("n_name").isin(nationA, nationB))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer
      .join(
        broadcast(nation.filter(col("n_name").isin(nationA, nationB))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .join(broadcast(supp), Seq("l_suppkey"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")), Seq("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(expr(s"sum($revUnitsSql)").as("rev_units"))
      .select(
        col("supp_nation"),
        col("cust_nation"),
        col("l_year").cast("long").as("l_year"),
        col("rev_units"),
        expr("CAST(rev_units AS DOUBLE) / 10000.0").as("revenue_dollars"))
  }

  /** TPC-H Q8-shaped market share: within a region's customer market,
    * the yearly revenue share supplied by one nation — numerator and
    * denominator are exact integer revenue units per year, share one
    * shared division. Dimension legs broadcast; one aggregation grid
    * keyed by order year with a conditional numerator (no second scan).
    */
  def marketShare(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String,
      supplierNation: String): DataFrame = {
    val marketNations = nation
      .join(
        broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = customer
      .join(broadcast(marketNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supp = supplier
      .join(
        broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation"))
    lineitem
      .join(broadcast(supp), Seq("l_suppkey"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey"), col("o_orderdate")), Seq("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        // parameter as a Column VALUE, never interpolated into expr():
        // the stratifiedHashSample rule — a quote in a nation name must
        // stay a value, not become SQL
        sum(when(col("supp_nation") === lit(supplierNation), expr(revUnitsSql))
          .otherwise(lit(0L))).as("num_units"),
        expr(s"sum($revUnitsSql)").as("den_units"))
      .select(
        col("o_year").cast("long").as("o_year"),
        col("num_units"),
        col("den_units"),
        expr("CAST(num_units AS DOUBLE) / CAST(den_units AS DOUBLE)").as("mkt_share"))
  }

  /** TPC-H Q14-shaped promo revenue share per ship month: conditional
    * vs total integer revenue units over a broadcast part join, share
    * scaled ×100 in one shared division.
    */
  def promoShare(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(
        broadcast(part.select(col("p_partkey").as("l_partkey"), col("p_type"))),
        Seq("l_partkey"))
      .groupBy(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("ship_month"))
      .agg(
        expr(s"sum(CASE WHEN p_type = 'PROMO' THEN $revUnitsSql ELSE CAST(0 AS BIGINT) END)")
          .as("promo_units"),
        expr(s"sum($revUnitsSql)").as("total_units"))
      .select(
        col("ship_month"),
        col("promo_units"),
        col("total_units"),
        // nullif: a month whose revenue units cancel to zero is NULL
        // share on both engines (DuckDB /0 = NULL; ANSI Spark throws).
        expr("100.0 * CAST(promo_units AS DOUBLE) / nullif(CAST(total_units AS DOUBLE), 0.0)")
          .as("promo_share"))

  /** Arc (midpoint) price elasticity of demand per brand, cheap-vs-
    * expensive halves split at the brand's LOWER-median retail price:
    * e = (Q₂−Q₁)(P̄₁+P̄₂) / ((Q₁+Q₂)(P̄₂−P̄₁)). The midpoint formula needs
    * no logarithm — quantities are exact integers, mean prices exact
    * integer sums over counts, and the elasticity is one fixed double
    * expression — so unlike log-log elasticity it is bit-portable. The
    * median split is a per-brand order statistic on the part dimension
    * (broadcast-sized); facts aggregate once per (brand, half).
    */
  def arcElasticity(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
    val split = part
      .select(col("p_partkey"), col("p_brand"), expr(Stages.centsSql("p_retailprice")).as("pc"))
      .withColumn("r", row_number().over(w.orderBy(col("pc").asc, col("p_partkey").asc)))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("med_r", expr("(n + 1) div 2"))
      .select(
        col("p_partkey").as("l_partkey"),
        col("p_brand"),
        col("pc"),
        (col("r") <= col("med_r")).as("cheap"))
    lineitem
      .join(broadcast(split), Seq("l_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        expr("sum(CASE WHEN cheap THEN CAST(round(l_quantity) AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
          .as("q1"),
        expr("sum(CASE WHEN NOT cheap THEN CAST(round(l_quantity) AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
          .as("q2"),
        expr("sum(CASE WHEN cheap THEN pc ELSE CAST(0 AS BIGINT) END)").as("ps1"),
        expr("sum(CASE WHEN cheap THEN 1 ELSE 0 END)").as("n1"),
        expr("sum(CASE WHEN NOT cheap THEN pc ELSE CAST(0 AS BIGINT) END)").as("ps2"),
        expr("sum(CASE WHEN NOT cheap THEN 1 ELSE 0 END)").as("n2"))
      .select(
        col("p_brand"),
        col("q1"), col("q2"), col("ps1"), col("n1"), col("ps2"), col("n2"),
        // lazy CASE → NULL guards (the momentStatsSql/linregSql
        // convention): a single-part brand leaves one half empty
        // (n1/n2 = 0), all-zero quantities make q1+q2 = 0, and equal
        // half-mean prices zero the price step — under ANSI each would
        // throw DIVIDE_BY_ZERO, and with ANSI off Spark's NULL would
        // diverge from DuckDB's ±Inf/NaN
        expr(
          """CASE WHEN n1 = 0 OR n2 = 0 OR q1 + q2 = 0 THEN NULL
                  WHEN CAST(ps2 AS DOUBLE) / CAST(n2 AS DOUBLE) = CAST(ps1 AS DOUBLE) / CAST(n1 AS DOUBLE) THEN NULL
                  ELSE (CAST(q2 - q1 AS DOUBLE) * (CAST(ps1 AS DOUBLE) / CAST(n1 AS DOUBLE) + CAST(ps2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                       / (CAST(q1 + q2 AS DOUBLE) * (CAST(ps2 AS DOUBLE) / CAST(n2 AS DOUBLE) - CAST(ps1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
             END""")
          .as("arc_elasticity"))
  }

  /** Inventory-planning readout for the top-20 parts by demand: per
    * part, daily-demand stats over its active ship days (integer
    * moments, divide-first σ), EOQ = √(2·D·S/H) with ordering cost
    * S=100 and holding cost H=20 as literals (√ of an exact integer
    * times a literal — bit-portable), 95% safety stock z·σ·√LT with
    * z = 1.6448536269514722 and lead time LT = 7 days embedded as
    * literals, and the reorder point μ·LT + SS. The classical
    * square-root OR formulas are exactly the transcendental-free shape
    * this engine can pin cross-engine. TakeOrdered top-20, no global
    * window.
    */
  def inventoryPlan(lineitem: DataFrame, k: Int = 20): DataFrame = {
    val perDay = lineitem
      .groupBy(col("l_partkey"), expr("CAST(l_shipdate AS DATE)").as("day"))
      .agg(expr("sum(CAST(round(l_quantity) AS BIGINT))").as("q"))
    val stats = perDay
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).cast("long").as("n_days"),
        sum(col("q")).as("d_total"),
        sum(col("q") * col("q")).as("d_sq"))
    val mu = "(CAST(d_total AS DOUBLE) / CAST(n_days AS DOUBLE))"
    val sigma = s"sqrt(CAST(d_sq AS DOUBLE) / CAST(n_days AS DOUBLE) - $mu * $mu)"
    rankedTopK(stats, k, col("d_total").desc, col("l_partkey").asc)
      .select(
        col("rank"),
        col("l_partkey"),
        col("n_days"),
        col("d_total"),
        expr(s"$mu").as("mean_daily"),
        expr(s"$sigma").as("sigma_daily"),
        expr("sqrt(2.0 * CAST(d_total AS DOUBLE) * 100.0 / 20.0)").as("eoq"),
        expr(s"1.6448536269514722 * $sigma * 2.6457513110645907").as("safety_stock"),
        expr(s"$mu * 7.0 + 1.6448536269514722 * $sigma * 2.6457513110645907").as("reorder_point"))
  }

  /** ABC×XYZ inventory segmentation matrix: ABC classes by cumulative
    * revenue share (A ≤ 80%, B ≤ 95%, C — ranked on exact integer
    * revenue units via [[scalableCumSum]], so the running sum stays
    * parallel even when |parts| outgrows one partition at corpus
    * scale), XYZ classes by demand variability over monthly
    * buckets (CV = σ/μ from integer moments, X < 0.5, Y < 1.0, Z —
    * classification by integer cross-multiplication 4σ² vs μ², σ² vs
    * μ², so no float ever decides a class). The 9-cell matrix with
    * part counts and revenue share drives cycle-count and safety-stock
    * policy per cell.
    */
  def abcXyzMatrix(lineitem: DataFrame): DataFrame = {
    // MEASURED NEGATIVE (r6; RE-MEASURED r10 after the ANSI default and
    // the integer widenings — `graft.AbcProbe`, interleaved best-of-2 at
    // sf0.1/32: two_scan 1.82/2.30 s vs one_scan 2.59/2.78 s): folding
    // the revenue units into the monthly grid (one lineitem scan, rev
    // rolled up from monthly + cacheT) loses ~0.6 s — the lean map-side
    // groupBy(partkey) revenue aggregate straight off the scan beats
    // routing revenue through the wider (partkey, month) shuffle twice
    // plus a materialization barrier. Two scans is the winning shape;
    // the query's board-max standing (~2.6 s on the r9 boards) is this
    // shape's inherent cost, not a regression.
    val monthly = lineitem
      .groupBy(
        col("l_partkey"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("m"))
      .agg(expr("sum(CAST(round(l_quantity) AS BIGINT))").as("q"))
    val perPart = monthly
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("nm"),
        sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sqq"))
    val rev = lineitem
      .groupBy(col("l_partkey"))
      .agg(expr(s"sum($revUnitsSql)").as("r"))
    val ranked = scalableCumSum(rev, "r", col("r").desc, col("l_partkey").asc)
      .crossJoin(broadcast(rev.agg(sum(col("r")).as("tot"))))
      .withColumn(
        "abc",
        expr("""CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                     WHEN cum * 100 <= tot * 95 THEN 'B'
                     ELSE 'C' END"""))
      .select(col("l_partkey"), col("r"), col("abc"))
    // CV classes by integer cross-multiplication: CV < t  ⇔  σ² < t²μ²
    // with σ² = (n·sqq − sq²)/n² and μ = sq/n  ⇔  n·sqq − sq² < t²·sq²
    val xyz = perPart.withColumn(
      "xyz",
      expr("""CASE WHEN 4 * (nm * sqq - sq * sq) < sq * sq THEN 'X'
                   WHEN nm * sqq - sq * sq < sq * sq THEN 'Y'
                   ELSE 'Z' END"""))
    ranked
      .join(xyz.select(col("l_partkey"), col("xyz")), Seq("l_partkey"))
      .groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).cast("long").as("n_parts"), sum(col("r")).as("rev_units"))
      .crossJoin(broadcast(rev.agg(sum(col("r")).as("tot"))))
      .select(
        col("abc"),
        col("xyz"),
        col("n_parts"),
        col("rev_units"),
        expr("CAST(rev_units AS DOUBLE) / CAST(tot AS DOUBLE)").as("rev_share"))
  }

  /** Knee (elbow) point of the cumulative revenue concentration curve —
    * the Kneedle-style rank maximizing the deviation of the cumulative
    * share from the straight chord: argmax_i (cᵢ·N − T·i), every term
    * exact on the DECIMAL(38,0) grid (no normalization divides until
    * the output; BIGINT would overflow at ~1.5× the sf0.1 fixture's
    * revenue mass), tie to the SMALLER rank. Where ABC's 80/95 cutoffs are policy, the
    * knee is the data's own "head ends here" point for cache and
    * hot-tier sizing. The ranking and running sum come from
    * [[scalableCumSum]] (blocked prefix sum — every stage parallel) and
    * the argmax is an `orderBy().limit(1)` → TakeOrderedAndProject
    * (per-partition heaps, driver merges one row), so nothing in the
    * plan funnels the part dimension through a single partition.
    */
  def kneePoint(lineitem: DataFrame): DataFrame = {
    val rev = lineitem
      .groupBy(col("l_partkey"))
      .agg(expr(s"sum($revUnitsSql)").as("r"))
    val ranked = scalableCumSum(rev, "r", col("r").desc, col("l_partkey").asc)
      .withColumnRenamed("rank", "i")
      .crossJoin(broadcast(
        rev.agg(sum(col("r")).as("t"), count(lit(1)).cast("long").as("n"))))
      // DECIMAL(38,0), not BIGINT: cum·n reaches 65% of 2^63 on the
      // sf0.1 fixture already — a corpus 1.5× larger would overflow
      // (ANSI: the query throws). Decimal keeps every term exact with
      // 10^19 headroom; the oracle widens through HUGEINT identically.
      .withColumn(
        "dev",
        col("cum").cast("decimal(38,0)") * col("n") - col("t").cast("decimal(38,0)") * col("i"))
    ranked
      .orderBy(col("dev").desc, col("i").asc)
      .limit(1)
      .select(
        col("n").as("n_parts"),
        col("i").as("knee_rank"),
        col("l_partkey").as("knee_partkey"),
        // the argmax/tie-break above ran on the exact decimal; the
        // REPORTED deviation rides double (DuckDB's pandas bridge
        // renders wide decimals as float64 anyway)
        col("dev").cast("double").as("dev_scaled"),
        expr("CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)").as("cum_share_at_knee"),
        expr("CAST(i AS DOUBLE) / CAST(n AS DOUBLE)").as("rank_share_at_knee"))
  }

  /** Rendezvous (highest-random-weight) sharding audit over documents:
    * each doc lands on the shard maximizing md5(doc_id ∥ shard) — the
    * coordination-free assignment scheme — for 8 shards and again for
    * 9, reporting per-shard-8 counts and how many docs MOVE when the
    * 9th shard joins. HRW's contract is that only ≈1/9 move (and only
    * INTO the new shard); the audit measures it exactly. Assignment is
    * a per-row argmax over 8/9 hash literals — map-side, integer, no
    * shuffle beyond the count.
    */
  def rendezvousShards(documents: DataFrame): DataFrame = {
    def h(n: Int): String =
      s"CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '_', '$n')), 1, 15), 16, 10) AS BIGINT)"
    def argmax(n: Int): String =
      (0 until n)
        .map(i => s"named_struct('h', ${h(i)}, 's', CAST($i AS BIGINT))")
        .mkString("array_max(array(", ", ", ")).s")
    documents
      .select(
        col("doc_id"),
        expr(argmax(8)).as("shard8"),
        expr(argmax(9)).as("shard9"))
      .groupBy(col("shard8"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L)).as("n_moved"),
        sum(when(col("shard8") =!= col("shard9") && col("shard9") =!= 8L, 1L).otherwise(0L))
          .as("n_moved_wrongly"))
      .select(
        col("shard8"),
        col("n_docs"),
        col("n_moved"),
        col("n_moved_wrongly"),
        expr("CAST(n_moved AS DOUBLE) / CAST(n_docs AS DOUBLE)").as("move_share"))
  }

  /** Virtual-node smoothing audit for consistent-ring placement: docs
    * hash onto a ring; with PLAIN placement each of 8 shards owns one
    * ring point, with VNODES each owns 16 points. Per scheme the audit
    * reports the max/mean shard-load ratio — the imbalance vnodes exist
    * to kill. Ring ownership = argmin over point hashes of
    * (point_hash − doc_hash) mod 2⁶⁰ — all integer; two map-side
    * assignments, two bounded aggregates.
    */
  def vnodeBalance(documents: DataFrame): DataFrame = {
    val ring = "1152921504606846976" // 2^60
    def docH = s"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    def pointH(s: Int, v: Int): String =
      s"CAST(conv(substring(md5('p_${s}_$v'), 1, 15), 16, 10) AS BIGINT)"
    def owner(vnodes: Int): String =
      (for { sh <- 0 until 8; v <- 0 until vnodes } yield
        s"named_struct('d', pmod(${pointH(sh, v)} - $docH, $ring), 's', CAST($sh AS BIGINT))")
        .mkString("array_min(array(", ", ", ")).s")
    val assigned = documents.select(
      expr(owner(1)).as("plain"),
      expr(owner(16)).as("vnode"))
    def stats(colName: String, scheme: String): DataFrame =
      assigned
        .groupBy(col(colName).as("shard"))
        .agg(count(lit(1)).as("n"))
        .agg(
          max(col("n")).as("max_load"),
          sum(col("n")).as("total"),
          count(lit(1)).cast("long").as("n_shards"))
        .select(
          lit(scheme).as("scheme"),
          col("n_shards"),
          col("max_load"),
          col("total"),
          expr("CAST(max_load * n_shards AS DOUBLE) / CAST(total AS DOUBLE)").as("imbalance"))
    stats("plain", "plain").unionAll(stats("vnode", "vnode16"))
  }

  /** TPC-H Q1 through the SQL-STRING surface: the same engine queries
    * are reachable as ANSI text via `spark.sql` over registered temp
    * views — the API-completeness witness that a SQL-first user of the
    * reference can drive this engine without touching the DataFrame
    * API. Aggregates stay exact integers (cents / cents×(100−disc)
    * units); Catalyst plans the text identically to the DataFrame
    * spelling.
    */
  def sqlQ1(spark: org.apache.spark.sql.SparkSession, lineitem: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("graft_sql_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_units,
                CAST(count(*) AS BIGINT) AS count_order
         FROM graft_sql_lineitem
         GROUP BY l_returnflag, l_linestatus""")
  }

  /** Window functions + CTE through the SQL-string surface: yearly
    * revenue by customer nation with each nation's share of its year
    * and year-over-year rank — `spark.sql` text over a THREE-view
    * stack (lineitem→orders→customer), proving CTEs, windows and the
    * temp-view catalog compose exactly like the DataFrame API.
    */
  def sqlNationYearShare(
      spark: org.apache.spark.sql.SparkSession,
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("graft_sql_l")
    orders.createOrReplaceTempView("graft_sql_o")
    customer.createOrReplaceTempView("graft_sql_c")
    nation.createOrReplaceTempView("graft_sql_n")
    spark.sql(
      """WITH rev AS (
           SELECT n_name, year(o_orderdate) AS o_year,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_units
           FROM graft_sql_l
           JOIN graft_sql_o ON l_orderkey = o_orderkey
           JOIN graft_sql_c ON o_custkey = c_custkey
           JOIN graft_sql_n ON c_nationkey = n_nationkey
           GROUP BY n_name, year(o_orderdate))
         SELECT n_name, CAST(o_year AS BIGINT) AS o_year, rev_units,
                CAST(rev_units AS DOUBLE)
                  / nullif(CAST(sum(rev_units) OVER (PARTITION BY o_year) AS DOUBLE), 0.0) AS year_share,
                CAST(row_number() OVER (PARTITION BY o_year ORDER BY rev_units DESC, n_name ASC) AS BIGINT)
                  AS year_rank
         FROM rev""")
  }

  /** TPC-H Q19-shaped bracket revenue: an OR of three (brand, size
    * range, quantity range) brackets evaluated in ONE pass — the
    * predicate pushes into the join output, no union of three scans.
    * Exact integer revenue units; one shared final division.
    */
  def bracketRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val cond =
      """(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#7' AND p_size BETWEEN 5 AND 30 AND l_quantity BETWEEN 10 AND 35)
         OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50)"""
    lineitem
      .join(
        broadcast(part.select(col("p_partkey").as("l_partkey"), col("p_brand"), col("p_size"))),
        Seq("l_partkey"))
      .filter(expr(cond))
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        expr(s"sum($revUnitsSql)").as("rev_units"))
      .select(
        col("n_rows"),
        col("rev_units"),
        expr("CAST(rev_units AS DOUBLE) / 10000.0").as("revenue_dollars"))
  }
}
