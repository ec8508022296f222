package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{RefPipelines, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is a pure function of (session, fixture dir); each has an
  * equivalent DuckDB oracle in [[oracleSql]] with identical column names
  * (the driver's compare hashes values under name-sorted columns). Results
  * are sorted on their natural unique key so both engines emit identical
  * row sets in a canonical order — the `orderBy` lives HERE (verify
  * surface), not in the engine stages, which stay order-free and
  * streaming-composable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefPipelines
      .hourlyAvgRevenue(Tables.events(spark, "/root/testdata/sf0.001"))
      .orderBy("date", "hour")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference parity: the six pipelines (SURVEY.md §0, §2) ----
    "q_full_table" -> ((s, dir) =>
      RefPipelines.fullTable(Tables.events(s, dir)).orderBy("event_id")),
    "q_abnormal_duration" -> ((s, dir) =>
      RefPipelines
        .abnormalDuration(Tables.lineitem(s, dir), Tables.orders(s, dir))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_abnormal_fee" -> ((s, dir) =>
      RefPipelines
        .abnormalFee(Tables.lineitem(s, dir), Tables.orders(s, dir))
        .orderBy("o_orderkey")),
    "q_hourly_avg_revenue" -> ((s, dir) =>
      RefPipelines.hourlyAvgRevenue(Tables.events(s, dir)).orderBy("date", "hour")),
    "q_hourly_trip_count" -> ((s, dir) =>
      RefPipelines.hourlyTripCount(Tables.events(s, dir)).orderBy("date", "hour")),
    "q_hourly_count_by_borough" -> ((s, dir) =>
      RefPipelines
        .hourlyCountByLookup(Tables.events(s, dir), Tables.nation(s, dir))
        .orderBy("date", "hour", "borough"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_full_table" ->
      """SELECT event_id, ts, user_id,
         CASE WHEN event_type = '' THEN NULL ELSE event_type END AS event_type,
         value,
         CASE WHEN json_extract_string(props, '$.k') = '' THEN NULL
              ELSE CAST(json_extract_string(props, '$.k') AS INTEGER) END AS props_k
         FROM events ORDER BY event_id""",
    "q_abnormal_duration" ->
      """SELECT l_orderkey, l_linenumber,
         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
         round((epoch(l_shipdate) - epoch(o_orderdate)) / 86400, 2) AS lead_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE (epoch(l_shipdate) - epoch(o_orderdate)) / 86400 < 1
            OR (epoch(l_shipdate) - epoch(o_orderdate)) / 86400 > 2000
         ORDER BY l_orderkey, l_linenumber""",
    "q_abnormal_fee" ->
      """WITH calc AS (
           SELECT l_orderkey,
                  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS caculated_total
           FROM lineitem GROUP BY l_orderkey)
         SELECT o_orderkey, round(o_totalprice, 2) AS total_amount,
                round(caculated_total, 2) AS caculated_total,
                round(abs(o_totalprice - caculated_total), 2) AS discrepancy
         FROM orders LEFT JOIN calc ON o_orderkey = l_orderkey
         WHERE abs(o_totalprice - caculated_total) > 1 OR o_totalprice IS NULL
         ORDER BY o_orderkey""",
    "q_hourly_avg_revenue" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d') AS date,
                strftime(date_trunc('hour', ts), '%H:%M:%S') AS hour,
                ${engine.Stages.halfUpAvgDollarsSql(engine.RefPipelines.valueCents)} AS avg_revenue,
                ${engine.Stages.halfUpAvgDollarsSql(engine.RefPipelines.purchaseCents)} AS avg_purchase,
                ${engine.Stages.halfUpAvgDollarsSql(engine.RefPipelines.signupCents)} AS avg_signup
         FROM events WHERE value IS NOT NULL
         GROUP BY date_trunc('hour', ts) ORDER BY 1, 2""",
    "q_hourly_trip_count" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d') AS date,
                strftime(date_trunc('hour', ts), '%H:%M:%S') AS hour,
                count(*) AS total_trips,
                count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_trips,
                count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_trips
         FROM events GROUP BY date_trunc('hour', ts) ORDER BY 1, 2""",
    "q_hourly_count_by_borough" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d') AS date,
                strftime(date_trunc('hour', ts), '%H:%M:%S') AS hour,
                n_name AS borough, count(user_id) AS trip_count
         FROM events LEFT JOIN nation ON (user_id % 25) = n_nationkey
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
  )
}
