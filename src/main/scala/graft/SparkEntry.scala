package graft

import graft.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions used by every query here:
  *  - reads only `$sfDir/<table>.parquet`;
  *  - any column that must hash-match the DuckDB oracle is integral,
  *    string, or boolean (cents via per-row round() then integer sum),
  *    never a float aggregate — IEEE sum order would break byte equality;
  *  - sketch queries output exact values (computable by the oracle) plus
  *    `within_*` booleans asserting the published error bound, so the
  *    DuckDB gate verifies the bound itself (the reference's analogue:
  *    classification accuracy vs ground truth, README.md:29).
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def cents(c: Column): Column =
    round(c * 100).cast("long")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("hll_distinct_users")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A12-style exact aggregation (baseline relational path).
    "q01_pricing_summary" -> { (s, dir) =>
      GraftFunctions.register(s)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // F2/A4: per-query relative-count filter (count >= 0.8 * max over group),
    // the reference's 0.8*max_count match filter (taxor_search.cpp:275-286).
    "q02_relative_max_filter" -> { (s, dir) =>
      val w = Window.partitionBy("l_orderkey")
      t(s, dir, "lineitem")
        .withColumn("mx", max(col("l_quantity")).over(w))
        .where(col("l_quantity") >= lit(0.8) * col("mx"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // J1-style broadcast dimension join + exact rollup metrics.
    "q03_segment_revenue" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      orders.join(broadcast(customer),
          orders("o_custkey") === customer("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .orderBy("c_mktsegment")
    },
    // S5/A2: HLL distinct cardinality per group, bound-checked in-query
    // against the exact distinct (which the oracle recomputes).
    "hll_distinct_users" -> { (s, dir) =>
      GraftFunctions.register(s)
      val p = 14
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact_distinct"),
          hll_estimate(hll_agg(col("user_id"), p)).as("est"))
        .select(col("event_type"), col("exact_distinct"),
          (abs(col("est") - col("exact_distinct")) <=
            lit(3 * graft.sketch.Hll.stdError(p)) * col("exact_distinct") +
              lit(2.0)).as("within_bound"))
        .orderBy("event_type")
    },
    // S3/A3: count-min heavy-hitter counts, eps-bounded vs exact.
    "cms_event_type_counts" -> { (s, dir) =>
      GraftFunctions.register(s)
      val eps = 0.0005
      val ev = t(s, dir, "events")
      val sk = ev.agg(cms_agg(col("event_type"), eps, 0.01).as("cms"))
      ev.groupBy("event_type").agg(count(lit(1)).as("exact_cnt"))
        .crossJoin(broadcast(sk))
        .select(col("event_type"), col("exact_cnt"),
          (cms_estimate(col("cms"), col("event_type")) >= col("exact_cnt"))
            .as("no_undercount"),
          (cms_estimate(col("cms"), col("event_type")) <=
            col("exact_cnt") + greatest(lit(1L),
              (lit(eps) * cms_total(col("cms"))).cast("long")))
            .as("within_eps"))
        .orderBy("event_type")
    },
    // S1/S2/S4: partitioned Bloom filter — zero false negatives on members,
    // measured FPR on held-out keys within 3x the configured bound.
    "bloom_membership" -> { (s, dir) =>
      GraftFunctions.register(s)
      val fpp = 0.01
      val members = t(s, dir, "orders").select(col("o_custkey")).distinct()
      val nMembers = members.count()
      val bf = members.agg(
        bloom_agg(col("o_custkey"), math.max(nMembers, 1024), fpp).as("bf"))
      val missed = members.crossJoin(broadcast(bf))
        .where(!bloom_contains(col("bf"), col("o_custkey")))
        .count()
      // held-out probes: synthetic keys far above any real custkey
      val probes = 200000L
      val fps = s.range(probes)
        .select((col("id") + 1000000000L).as("k"))
        .crossJoin(broadcast(bf))
        .where(bloom_contains(col("bf"), col("k")))
        .count()
      import s.implicits._
      Seq((missed, fps <= (3 * fpp * probes).toLong))
        .toDF("members_missed", "fpr_bounded")
    },
    // KLL quantiles of l_extendedprice: realized rank error <= bound.
    "kll_price_quantiles" -> { (s, dir) =>
      GraftFunctions.register(s)
      val li = t(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
      val sk = li.agg(kll_agg(col("x"), 200).as("kll"))
      val n = li.count().toDouble
      val eps = 3 * 2.296 / 200 + 0.005
      val qs = Seq(0.1 -> "q10", 0.5 -> "q50", 0.9 -> "q90", 0.99 -> "q99")
      val rows = qs.map { case (q, label) =>
        val est = li.crossJoin(broadcast(sk))
          .select(kll_quantile(col("kll"), q)).first().getDouble(0)
        val rank = li.where(col("x") < est).count() / n
        (label, math.abs(rank - q) <= eps)
      }
      import s.implicits._
      rows.toDF("q_label", "within_rank_error").orderBy("q_label")
    },
    // t-digest quantiles of events.value: realized rank error small,
    // tails tighter than the middle (the t-digest selling point).
    "tdigest_value_quantiles" -> { (s, dir) =>
      GraftFunctions.register(s)
      val ev = t(s, dir, "events").select(col("value").as("x"))
        .where(col("x").isNotNull)
      val sk = ev.agg(tdigest_agg(col("x"), 100).as("td"))
      val n = ev.count().toDouble
      val qs = Seq(0.01 -> "q01", 0.5 -> "q50", 0.99 -> "q99")
      val rows = qs.map { case (q, label) =>
        val est = ev.crossJoin(broadcast(sk))
          .select(tdigest_quantile(col("td"), q)).first().getDouble(0)
        val rank = ev.where(col("x") < est).count() / n
        (label, math.abs(rank - q) <= (if (q == 0.5) 0.02 else 0.01))
      }
      import s.implicits._
      rows.toDF("q_label", "within_rank_error").orderBy("q_label")
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS sum_base_cents,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q02_relative_max_filter" ->
      """SELECT l_orderkey, l_linenumber FROM (
           SELECT l_orderkey, l_linenumber, l_quantity,
                  max(l_quantity) OVER (PARTITION BY l_orderkey) AS mx
           FROM lineitem)
         WHERE l_quantity >= 0.8*mx ORDER BY l_orderkey, l_linenumber""",
    "q03_segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         sum(CAST(round(o_totalprice*100) AS BIGINT)) AS revenue_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "hll_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
         true AS within_bound FROM events GROUP BY 1 ORDER BY 1""",
    "cms_event_type_counts" ->
      """SELECT event_type, count(*) AS exact_cnt, true AS no_undercount,
         true AS within_eps FROM events GROUP BY 1 ORDER BY 1""",
    "bloom_membership" ->
      "SELECT CAST(0 AS BIGINT) AS members_missed, true AS fpr_bounded",
    "kll_price_quantiles" ->
      """SELECT q_label, true AS within_rank_error FROM (VALUES ('q10'),
         ('q50'),('q90'),('q99')) AS t(q_label) ORDER BY q_label""",
    "tdigest_value_quantiles" ->
      """SELECT q_label, true AS within_rank_error FROM (VALUES ('q01'),
         ('q50'),('q99')) AS t(q_label) ORDER BY q_label"""
  )
}
