"""Advanced / extension queries: timezone conversion (P11), grouped
pandas transforms (A6 via Arrow), session windows, rollup aggregation,
and an as-of join — operators a quote-stream engine needs that the
reference approximates or lacks (SURVEY.md §2.3 note: no as-of joins
exist in the reference; DuckDB has native ASOF JOIN as the oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.common import materialize
from ..operators.joins import hint_small
from ..tables import load_table
from . import register


@register(
    "tz_convert",
    oracle="""
SELECT event_id,
       ts,
       timezone('America/Sao_Paulo', timezone('UTC', ts)) AS ts_sp,
       CAST(strftime(timezone('America/Sao_Paulo', timezone('UTC', ts)), '%H') AS BIGINT) AS local_hour
FROM events
""",
    survey="P11 F3",
    description="UTC → America/Sao_Paulo wall-time conversion "
    "(reference analytics_service/dashboard.py:48-51 tz_localize/"
    "tz_convert).",
)
def tz_convert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sp = F.from_utc_timestamp("ts", "America/Sao_Paulo")
    return ev.select(
        "event_id",
        "ts",
        sp.alias("ts_sp"),
        F.date_format(sp, "HH").cast("long").alias("local_hour"),
    )


@register(
    "grouped_zscore",
    oracle="""
WITH stats AS (
  SELECT user_id, avg(value) AS m, stddev_samp(value) AS s, count(*) AS n
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       round((e.value - st.m) / st.s, 6) AS zscore
FROM events e JOIN stats st USING (user_id)
WHERE st.s > 0
""",
    survey="A6 (grouped pandas transform, Arrow path)",
    description="Per-group pandas transform via applyInPandas (the "
    "reference's per-symbol chart-frame iteration, reference "
    "include/tasks/generate_dashboard.py:39-41, as a distributed "
    "grouped-map): z-score of value within each key. Demonstrates the "
    "Arrow grouped-map path with an exact SQL oracle.",
)
def grouped_zscore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["value"].std(ddof=1)
        if not np.isfinite(s) or s <= 0:
            return pd.DataFrame(columns=["event_id", "user_id", "zscore"])
        m = pdf["value"].mean()
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": ((pdf["value"] - m) / s).round(6),
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="event_id long, user_id long, zscore double"
    )


@register(
    "session_windows",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM numbered
GROUP BY user_id, session_id
""",
    survey="T8 (session window) O1",
    description="Sessionization with a 30-minute inactivity gap — "
    "Spark's native session_window (works identically in Structured "
    "Streaming with watermarks); oracle is the classic gaps-and-"
    "islands SQL.",
)
def session_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "rollup_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue,
       count(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    survey="A7 extension (rollup/grouping sets)",
    description="Hierarchical rollup totals (flag → flag+status → "
    "grand total) in one pass — GROUPING SETS surface the reference "
    "lacks entirely. Revenue accumulates in DECIMAL(38,6) (r8 "
    "scale-stable recipe, PARITY.md) — the grand-total grouping set "
    "sums the WHOLE corpus, the case most exposed to double-SUM "
    "order drift.",
)
def rollup_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(38,6)")
                ).cast("double"),
                6,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "ranking_suite",
    oracle="""
SELECT user_id, event_id,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile,
       first_value(value) OVER w AS first_val,
       round(value - first_value(value) OVER w, 6) AS delta_from_first
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
""",
    survey="W extension (ranking functions)",
    description="Ranking-function suite per key (rank/dense_rank/"
    "ntile/first_value) — window surface beyond the reference's "
    "rolling frames; deterministic ordering via (value DESC, id).",
)
def ranking_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    # long casts: Spark's rank/ntile yield int32 but DuckDB yields
    # int64 — the hash compares values, but keep schemas aligned too
    return ev.select(
        "user_id",
        "event_id",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("value").over(w).alias("first_val"),
        F.round(F.col("value") - F.first("value").over(w), 6).alias(
            "delta_from_first"
        ),
    )


@register(
    "cube_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6)
         AS total_price,
       count(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    survey="A7 extension (cube/grouping sets)",
    description="Full cube over (returnflag, linestatus): all four "
    "grouping combinations in one pass. Totals accumulate in "
    "DECIMAL(38,6) (r8 scale-stable recipe, PARITY.md).",
)
def cube_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast(
                "double"
            ),
            6,
        ).alias("total_price"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, round(val, 6) AS val
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
)
""",
    survey="J4 inverse (unpivot/melt)",
    description="Wide→long unpivot of three measures via stack() — "
    "the inverse reshape of the pivot (J4).",
)
def unpivot_measures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (measure, val_raw)",
    ).selectExpr("l_orderkey", "l_linenumber", "measure", "round(val_raw, 6) AS val")


@register(
    "exact_percentiles",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
       round(min(o_totalprice), 6) AS min_price,
       round(max(o_totalprice), 6) AS max_price
FROM orders
GROUP BY o_orderpriority
""",
    survey="A7 extension (exact percentiles)",
    description="Exact interpolated percentiles per group (Spark "
    "percentile ≡ DuckDB quantile_cont). The approx_percentile "
    "sketch variant is the 100 TB path; the exact one is the oracle-"
    "checkable baseline.",
)
def exact_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.5), 6).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 6).alias("p90_price"),
        F.round(F.min("o_totalprice"), 6).alias("min_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
    )


@register(
    "set_operations",
    oracle="""
WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
     clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT user_id, 'both' AS membership FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
UNION ALL
SELECT user_id, 'buy_only' FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM clickers)
UNION ALL
SELECT user_id, 'click_only' FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
""",
    survey="§2.7 extension (intersect/except — absent in reference)",
    description="Set-operation surface: INTERSECT / EXCEPT membership "
    "partition of two key sets (the reference only ever unions).",
)
def set_operations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # each key set feeds three set operators; materialize the
    # |users|-bounded distinct sets so the events scan runs once per
    # side instead of once per consumer (6 scans, scan_audit r7) —
    # the INTERSECT/EXCEPT operators themselves are the point here
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct().transform(materialize)
    )
    clickers = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id").distinct().transform(materialize)
    )
    both = buyers.intersect(clickers).select(
        "user_id", F.lit("both").alias("membership")
    )
    buy_only = buyers.exceptAll(clickers).select(
        "user_id", F.lit("buy_only").alias("membership")
    )
    click_only = clickers.exceptAll(buyers).select(
        "user_id", F.lit("click_only").alias("membership")
    )
    return both.unionByName(buy_only).unionByName(click_only)


@register(
    "time_range_window",
    oracle="""
SELECT user_id, event_id, ts, value,
       floor(CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / count(value) OVER w * 1000000 + 0.5) / 1000000 AS avg_7d,
       count(*) OVER w AS n_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
)
""",
    survey="W extension (time-based RANGE frame)",
    description="Trailing 7-DAY time-window average per key — a RANGE "
    "frame over event time (vs the reference's row-count frames "
    "W1/W2): Spark rangeBetween over epoch seconds ≡ SQL RANGE "
    "BETWEEN INTERVAL. The trailing average uses the r8 scale-stable "
    "recipe (PARITY.md): DECIMAL(38,6) window sum + portable "
    "floor(q*1e6+0.5)/1e6 quotient rounding, so every engine agrees "
    "at every scale.",
)
def time_range_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # µs-precision epoch: unix_timestamp would truncate to seconds and
    # disagree with the oracle's µs-exact INTERVAL frame at boundaries
    usec = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(usec)
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    q = F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast(
        "double"
    ) / F.count("value").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (F.floor(q * 1000000 + F.lit(0.5)) / 1000000).alias("avg_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


@register(
    "asof_join",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.event_id, p.ts, p.value,
       c.click_ts AS last_click_ts,
       c.click_value AS last_click_value
FROM purchases p
ASOF JOIN clicks c
  ON p.user_id = c.user_id AND c.click_ts <= p.ts
""",
    survey="ext:asof-join (SURVEY §2.3: absent in reference; core "
    "quote-stream operator)",
    description="As-of (backward) join: each purchase matched with "
    "the latest prior click per user. Spark lacks a native ASOF "
    "operator — implemented as ONE event_type-IN scan with "
    "conditional projections + last_value(ignoreNulls) over an "
    "ordered per-key window: one scan, one shuffle+sort, no "
    "range-join blowup (and zero exchanges on a user_id-bucketed "
    "layout); DuckDB's native ASOF JOIN is the oracle.",
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ONE scan instead of a union of two filtered scans (r17, guide
    # §2.4/§6): the purchase/click branches read the SAME table and
    # only remap columns, so a single `event_type IN (...)` scan with
    # conditional projections is row-identical — the union shape also
    # erased the scan's output partitioning, which is what blocks the
    # zero-exchange plan on a user_id-bucketed events layout (the
    # bucketed-layout experiment in plans/r17/bucketed_events.md: this
    # single-scan form over a bucketed table plans NO exchange at
    # all). Interleaved runs at the 8x fixture: min 0.48 -> 0.34 s;
    # scan pin events: 2 -> 1.
    isp = F.col("event_type") == "purchase"
    base = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        F.when(isp, F.col("event_id")).alias("event_id"),
        F.when(isp, F.col("value")).alias("value"),
        F.when(~isp, F.col("ts")).alias("_click_ts"),
        F.when(~isp, F.col("value")).alias("_click_value"),
        isp.cast("int").alias("_is_probe"),
    )
    # clicks sort before purchases at equal ts (_is_probe asc) so
    # c.ts <= p.ts includes equality, matching ASOF JOIN
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("_is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = base.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        "_is_probe",
        F.last("_click_ts", ignorenulls=True).over(w).alias("last_click_ts"),
        F.last("_click_value", ignorenulls=True).over(w).alias("last_click_value"),
    )
    return (
        merged.filter((F.col("_is_probe") == 1) & F.col("last_click_ts").isNotNull())
        .select(
            "user_id", "event_id", "ts", "value", "last_click_ts", "last_click_value"
        )
    )


@register(
    "approx_aggregates",
    oracle="""
SELECT event_type, count(*) AS n_events,
       TRUE AS users_in_bound, TRUE AS p50_in_bound,
       TRUE AS p95_in_bound, TRUE AS p99_in_bound
FROM events GROUP BY event_type
""",
    survey="ext:approx-aggregates (A7 at 100 TB)",
    description="Sketch-based aggregation: per event_type "
    "approx_count_distinct(user_id) (HyperLogLog++, rsd 2%) and "
    "approx_percentile(value, {0.5, 0.95, 0.99}, accuracy 10000). "
    "At 100 TB exact COUNT(DISTINCT) is a full shuffle of every key "
    "and exact percentiles a global sort; sketches are one scan + "
    "constant-size merge, the only viable shape. Sketch outputs are "
    "engine-specific, so the registered output is bound-vs-exact: "
    "exact n_events plus booleans asserting the HLL estimate is "
    "within 3·rsd of the exact distinct count and each approx "
    "percentile lies between the exact percentiles at q ± 0.01 "
    "(the KLL rank guarantee with margin). Sketches are RNG-free, "
    "so the booleans are stable; the SQL oracle claims them TRUE — "
    "any sketch regression flips a value and fails the hash check. "
    "The exact counterparts here are the verification harness, not "
    "the production path.",
)
def approx_aggregates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_au"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("_aq"),
        F.count_distinct("user_id").alias("_eu"),
        F.percentile(
            "value", F.array(*[F.lit(q) for q in
                               (0.49, 0.51, 0.94, 0.96, 0.98, 1.0)])
        ).alias("_eq"),
        F.count(F.lit(1)).alias("n_events"),
    )

    def _between(approx, lo, hi):
        return (approx >= lo) & (approx <= hi)

    return agg.select(
        "event_type",
        "n_events",
        (F.abs(F.col("_au") - F.col("_eu")) <= 0.06 * F.col("_eu")).alias(
            "users_in_bound"
        ),
        _between(F.col("_aq")[0], F.col("_eq")[0], F.col("_eq")[1]).alias(
            "p50_in_bound"
        ),
        _between(F.col("_aq")[1], F.col("_eq")[2], F.col("_eq")[3]).alias(
            "p95_in_bound"
        ),
        _between(F.col("_aq")[2], F.col("_eq")[4], F.col("_eq")[5]).alias(
            "p99_in_bound"
        ),
    )


@register(
    "topk_per_group",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_custkey,
       round(o_totalprice, 6) AS o_totalprice, seg_rank
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_custkey, o.o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
         ) AS BIGINT) AS seg_rank
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
)
WHERE seg_rank <= 3
""",
    survey="W A3 per-group top-k",
    description="Top-3 orders per market segment: rank-filter "
    "compiled to WindowGroupLimit, so each partition retains only "
    "k rows BEFORE the window sort/shuffle — per-group top-k over "
    "100 TB without sorting whole partitions.",
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("seg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("seg_rank") <= 3)
        .select(
            "c_mktsegment", "o_orderkey", "o_custkey",
            F.round("o_totalprice", 6).alias("o_totalprice"), "seg_rank",
        )
    )


@register(
    "value_histogram",
    oracle="""
SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 6) AS lo,
       round(max(o_totalprice), 6) AS hi,
       round(avg(o_totalprice), 6) AS mean_price
FROM orders
GROUP BY 1
""",
    survey="ext:histogram (A7 binning)",
    description="Fixed-width histogram of order totals (10 x 50k "
    "buckets, last bucket open-ended): binning as pure floor "
    "arithmetic — identical double ops in both engines, no "
    "width_bucket dependency — aggregated map-side like any groupBy.",
)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)
    ).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
            F.round(F.avg("o_totalprice"), 6).alias("mean_price"),
        )
    )


@register(
    "incident_window_join",
    oracle="""
WITH w AS (
  SELECT event_id AS window_id, ts AS w_start,
         ts + INTERVAL 15 MINUTE AS w_end
  FROM events WHERE event_type = 'error'
), p AS (
  SELECT event_id, ts, value FROM events WHERE event_type <> 'error'
)
SELECT w.window_id,
       count(p.event_id) AS n_events,
       floor(CAST(sum(CAST(p.value AS DECIMAL(38,6))) AS DOUBLE)
             / count(p.value) * 1000000 + 0.5) / 1000000 AS avg_value
FROM w LEFT JOIN p ON p.ts >= w.w_start AND p.ts < w.w_end
GROUP BY w.window_id
""",
    survey="ext:range-join (point-in-interval)",
    description="Incident correlation range join: every non-error "
    "event landing in the 15 minutes after an error event, aggregated "
    "per incident window (zero-event windows kept). Implemented as a "
    "bucketed equi-join — intervals explode into coarse time buckets, "
    "points hash into one, exact range filter inside the bucket — "
    "because a raw theta join is a nested-loop cross product Spark "
    "cannot hash; the oracle uses the plain range predicate (DuckDB "
    "plans an IEJoin).",
)
def incident_window_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import point_in_interval_join

    ev = load_table(spark, sf_dir, "events")
    w = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("w_end"),
    )
    p = ev.filter(F.col("event_type") != "error").select(
        F.col("event_id").alias("p_event_id"), "ts", "value"
    )
    matched = point_in_interval_join(
        p, w, point_ts="ts", start_col="w_start", end_col="w_end",
        bucket_seconds=900, how="left",
    )
    # r8 scale-stable recipe (PARITY.md): decimal sum + portable
    # quotient rounding; NULL on zero-event windows either way
    q = F.sum(F.col("value").cast("decimal(38,6)")).cast(
        "double"
    ) / F.count("value")
    return matched.groupBy("window_id").agg(
        F.count("p_event_id").alias("n_events"),
        (F.floor(q * 1000000 + F.lit(0.5)) / 1000000).alias("avg_value"),
    )


@register(
    "distribution_rank",
    oracle="""
SELECT user_id, event_id,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC)
""",
    survey="W extension (distribution functions)",
    description="Distribution-function suite per key (percent_rank / "
    "cume_dist) — completes the window-function surface next to "
    "ranking_suite; deterministic ordering via (value, id).",
)
def distribution_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "window_dedup",
    oracle="""
SELECT event_id, user_id, event_type, ts FROM (
  SELECT event_id, user_id, event_type, ts,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS prev_type
  FROM events
)
WHERE prev_type IS NULL OR event_type <> prev_type
""",
    survey="A extension (ordered consecutive dedup)",
    description="Consecutive-duplicate suppression per key (keep a row "
    "only when its event_type differs from the previous row's): the "
    "ordered lag() dedup every CDC/telemetry feed needs, one window "
    "pass, no self-join.",
)
def window_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("event_id", "user_id", "event_type", "ts")
    )


@register(
    "skew_salted_join",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 6) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment
""",
    survey="J1 extension (skew-mitigating salted equi-join)",
    description="Per-segment event totals through an explicitly salted "
    "fact-to-dim join: the dim side is exploded salt_buckets times and "
    "the fact key salted by xxhash64(event_id) mod buckets, so one "
    "pathological hot key spreads over salt_buckets shuffle partitions "
    "instead of melting a single reducer. Row-identical to the plain "
    "join (the oracle IS the plain join), deterministic under retries "
    "because the salt derives from the row id, not rand(). Extends the "
    "reference's snapshot equi-join (include/tasks/data_processing.py:"
    "44-64) to the skewed-key regime AQE skew-split can't fix when the "
    "build side itself overflows.",
)
def skew_salted_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "user_id"
    )
    joined = salted_join(ev, cust, "user_id", left_unique_col="event_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def _pagerank_oracle(iters: int = 3, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (DuckDB)."""
    ctes = ["""edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)""", """norm AS (
  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM edges
)""", """nn AS (SELECT count(*) AS n FROM nation)""", """r0 AS (
  SELECT n_nationkey AS node, 1.0 / nn.n AS rank FROM nation, nn
)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""r{i} AS (
  SELECT na.n_nationkey AS node,
         (1 - {damping}) / nn.n
           + {damping} * coalesce(sum(norm.p * r{i-1}.rank), 0) AS rank
  FROM nation na CROSS JOIN nn
  LEFT JOIN norm ON norm.dst = na.n_nationkey
  LEFT JOIN r{i-1} ON r{i-1}.node = norm.src
  GROUP BY na.n_nationkey, nn.n
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT na.n_name AS nation, round(r{iters}.rank, 6) AS pagerank
FROM r{iters} JOIN nation na ON na.n_nationkey = r{iters}.node
"""
    )


@register(
    "trade_pagerank",
    oracle=_pagerank_oracle(),
    survey="ext: iterative graph algorithm (weighted PageRank)",
    description="Weighted PageRank (3 fixed iterations, damping 0.85) "
    "over the nation-to-nation trade graph (edge weight = revenue from "
    "customers in src nation to suppliers in dst nation). The iterative "
    "pattern Spark expresses as a driver loop of joins: the edge table "
    "is the big partitioned operand, the 25-row rank vector re-joins "
    "(auto-broadcast) each iteration — the shape that scales to "
    "billion-edge graphs where only the rank vector moves per round. "
    "Oracle: the same three iterations unrolled as chained CTEs.",
)
def trade_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    damping, iters = 0.85, 3
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.sum(li["l_extendedprice"] * (1 - li["l_discount"])).alias("w"))
    )
    wsrc = Window.partitionBy("src")
    norm = edges.select(
        "src", "dst", (F.col("w") / F.sum("w").over(wsrc)).alias("p")
    ).localCheckpoint()  # edge graph is reused every iteration

    n = nation.count()
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            norm.join(ranks, norm["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("mass"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit((1 - damping) / n)
                + damping * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.join(nation, ranks["node"] == nation["n_nationkey"]).select(
        F.col("n_name").alias("nation"),
        F.round("rank", 6).alias("pagerank"),
    )


@register(
    "data_quality_report",
    oracle="""
WITH li AS (
  SELECT count(*) AS n,
         sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS v_notnull,
         sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS v_qty,
         sum(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END) AS v_disc,
         sum(CASE WHEN l_tax <= 0.05 THEN 0 ELSE 1 END) AS v_tax,
         sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS v_enum,
         count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_pk
  FROM lineitem
), lo AS (
  SELECT (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS v,
         (SELECT count(*) FROM lineitem) AS n
), ec AS (
  SELECT (SELECT count(*) FROM events e WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS v,
         (SELECT count(*) FROM events) AS n
)
SELECT 'lineitem' AS table_name, 'l_orderkey_not_null' AS check_name,
       CAST(v_notnull AS BIGINT) AS n_violations, n AS n_rows,
       round(v_notnull / n, 6) AS violation_rate FROM li
UNION ALL SELECT 'lineitem', 'l_quantity_range_1_50',
       CAST(v_qty AS BIGINT), n, round(v_qty / n, 6) FROM li
UNION ALL SELECT 'lineitem', 'l_discount_range_0_0.1',
       CAST(v_disc AS BIGINT), n, round(v_disc / n, 6) FROM li
UNION ALL SELECT 'lineitem', 'l_tax_cap_0.05',
       CAST(v_tax AS BIGINT), n, round(v_tax / n, 6) FROM li
UNION ALL SELECT 'lineitem', 'l_returnflag_enum',
       CAST(v_enum AS BIGINT), n, round(v_enum / n, 6) FROM li
UNION ALL SELECT 'lineitem', 'line_pk_unique',
       CAST(v_pk AS BIGINT), n, round(v_pk / n, 6) FROM li
UNION ALL SELECT 'lineitem', 'fk_orderkey_in_orders',
       v, n, round(v / n, 6) FROM lo
UNION ALL SELECT 'events', 'fk_user_in_customer',
       v, n, round(v / n, 6) FROM ec
""",
    survey="ext:data-quality audit (P7/A8 made first-class)",
    description="Data-quality audit report: every predicate rule "
    "(not-null, ranges, enum membership) folds into ONE conditional-"
    "sum aggregate over ONE lineitem scan — adding a rule adds an "
    "expression, never a pass, the only affordable shape at 100 TB. "
    "Key uniqueness is a distinct-count on the key columns alone "
    "(column pruning keeps the scan narrow) and referential integrity "
    "is a keys-only broadcast anti-join. The reference's equivalents "
    "are silent dropna/empty guards (include/tasks/batch_ingestion."
    "py:30,37); here every rule reports its violation count.",
)
def data_quality_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import (
        constraint_report,
        duplicate_key_count,
        orphan_count,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    checks = {
        "l_orderkey_not_null": F.col("l_orderkey").isNotNull(),
        "l_quantity_range_1_50": F.col("l_quantity").between(1, 50),
        "l_discount_range_0_0.1": F.col("l_discount").between(0.0, 0.1),
        "l_tax_cap_0.05": F.col("l_tax") <= 0.05,
        "l_returnflag_enum": F.col("l_returnflag").isin("A", "N", "R"),
    }
    return (
        constraint_report(li, "lineitem", checks)
        .unionByName(
            duplicate_key_count(
                li, "lineitem", ["l_orderkey", "l_linenumber"], "line_pk_unique"
            )
        )
        .unionByName(
            orphan_count(
                li, orders, "l_orderkey", "o_orderkey",
                "lineitem", "fk_orderkey_in_orders",
            )
        )
        .unionByName(
            orphan_count(
                ev, cust, "user_id", "c_custkey",
                "events", "fk_user_in_customer",
            )
        )
    )


@register(
    "incremental_agg_merge",
    oracle="""
SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value,
       round(sum(value) / count(*), 6) AS avg_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events
GROUP BY 1, 2
""",
    survey="ext: incremental materialized rollup (T5 done right)",
    description="Incrementally-maintained per-user daily rollup: the "
    "events table is split at a mid-day cutoff into a 'stored history' "
    "batch and a 'new arrivals' batch, per-key algebraic partials "
    "(cnt/sum/min/max) are computed on each INDEPENDENTLY, and the "
    "merge folds them back — provably equal to the direct aggregate "
    "over everything (the oracle). This is the fix for the reference's "
    "recompute-40-days-every-minute warehouse loop (include/tasks/"
    "data_warehouse.py:67-78): at 100 TB the stored partials stay "
    "hash-partitioned in place and each micro-batch merges work "
    "proportional to the batch, not the history. The cutoff "
    "deliberately splits days so groups straddle both batches.",
)
def incremental_agg_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import (
        merge_partial_aggregates,
        partial_aggregates,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value", "ts"
    )
    cutoff = F.to_timestamp(F.lit("2024-01-20 12:00:00"))
    history = ev.filter(F.col("ts") < cutoff).drop("ts")
    fresh = ev.filter(F.col("ts") >= cutoff).drop("ts")
    merged = merge_partial_aggregates(
        [
            partial_aggregates(history, ["user_id", "day"], "value"),
            partial_aggregates(fresh, ["user_id", "day"], "value"),
        ],
        ["user_id", "day"],
    )
    return merged.select(
        "user_id",
        "day",
        F.col("cnt").alias("n_events"),
        F.round("s", 6).alias("total_value"),
        F.round(F.col("s") / F.col("cnt"), 6).alias("avg_value"),
        F.round("mn", 6).alias("min_value"),
        F.round("mx", 6).alias("max_value"),
    )


@register(
    "snapshot_diff_feed",
    oracle="""
WITH s1 AS (
  SELECT user_id, round(value, 6) AS value, event_type
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-15') t WHERE rn = 1
), s2 AS (
  SELECT user_id, round(value, 6) AS value, event_type
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-25') t WHERE rn = 1
)
SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
       CASE WHEN s1.user_id IS NULL THEN 'added'
            WHEN s2.user_id IS NULL THEN 'removed'
            WHEN s1.value IS DISTINCT FROM s2.value
              OR s1.event_type IS DISTINCT FROM s2.event_type
            THEN 'changed' ELSE 'unchanged' END AS change_type,
       s1.value AS old_value, s1.event_type AS old_event_type,
       s2.value AS new_value, s2.event_type AS new_event_type
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
WHERE NOT (s1.user_id IS NOT NULL AND s2.user_id IS NOT NULL
           AND s1.value IS NOT DISTINCT FROM s2.value
           AND s1.event_type IS NOT DISTINCT FROM s2.event_type)
""",
    survey="ext: snapshot diff / CDC change feed (K3 made observable)",
    description="Change feed between two as-of states of the keyed "
    "event table (latest row per user at t1 vs t2, deterministic "
    "event_id tie-break): full-outer join on the key, null-safe "
    "compare on the tracked columns, rows classified added/changed "
    "(/removed). The reference full-replaces its warehouse every "
    "minute so consumers can't see what changed (include/tasks/"
    "data_warehouse.py:78); this derives the delta — at scale both "
    "snapshots shuffle once on the key, or not at all when they share "
    "a bucketed layout.",
)
def snapshot_diff_feed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rowops import snapshot_diff

    ev = load_table(spark, sf_dir, "events")

    def state(upto: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            ev.filter(F.col("ts") <= F.lit(upto).cast("timestamp"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id", F.round("value", 6).alias("value"), "event_type"
            )
        )

    return snapshot_diff(
        state("2024-01-15"),
        state("2024-01-25"),
        ["user_id"],
        ["value", "event_type"],
    )


@register(
    "winsorized_stats",
    oracle="""
WITH pct AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n_events,
       round(avg(e.value), 6) AS raw_mean,
       round(avg(greatest(pct.p05, least(pct.p95, e.value))), 6)
         AS winsorized_mean,
       round(min(pct.p05), 6) AS p05,
       round(min(pct.p95), 6) AS p95
FROM events e JOIN pct USING (event_type)
GROUP BY e.event_type
""",
    survey="ext: robust statistics (winsorized moments)",
    description="Outlier-robust per-group statistics: exact "
    "interpolated p05/p95 per event_type (Spark percentile ≡ DuckDB "
    "quantile_cont), values clamped to that band, winsorized mean vs "
    "raw mean. Two stages: the percentile aggregate produces a "
    "groups-sized table that broadcast-joins back onto the fact — the "
    "clamp-and-average second pass is one scan, no second shuffle of "
    "the fact. The standard guard before any mean-based quality "
    "signal on heavy-tailed 100 TB telemetry.",
)
def winsorized_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    clamped = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value")))
    return (
        ev.join(hint_small(pct), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
            F.round(F.avg(clamped), 6).alias("winsorized_mean"),
            F.round(F.min("p05"), 6).alias("p05"),
            F.round(F.min("p95"), 6).alias("p95"),
        )
    )


@register(
    "quarantine_rows",
    oracle="""
SELECT * FROM (
  SELECT l_orderkey, l_linenumber,
    concat_ws(',',
      CASE WHEN l_orderkey IS NOT NULL THEN NULL ELSE 'l_orderkey_not_null' END,
      CASE WHEN l_quantity BETWEEN 1 AND 50 THEN NULL ELSE 'l_quantity_range_1_50' END,
      CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN NULL ELSE 'l_discount_range_0_0.1' END,
      CASE WHEN l_tax <= 0.05 THEN NULL ELSE 'l_tax_cap_0.05' END,
      CASE WHEN l_returnflag IN ('A','N','R') THEN NULL ELSE 'l_returnflag_enum' END
    ) AS failed_rules
  FROM lineitem
) WHERE failed_rules <> ''
""",
    survey="ext:data-quality quarantine (row routing)",
    description="Quarantine split: the row-level complement of "
    "data_quality_report — WHICH rows fail and WHY. Each quarantined "
    "row carries failed_rules, the comma-joined rule-order list of "
    "violated checks (concat_ws skips passing rules' NULL slots in "
    "both engines). One codegen'd projection per row, no shuffle; "
    "the clean side of the same split feeds downstream unchanged.",
)
def quarantine_rows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import quarantine_split

    li = load_table(spark, sf_dir, "lineitem")
    checks = {
        "l_orderkey_not_null": F.col("l_orderkey").isNotNull(),
        "l_quantity_range_1_50": F.col("l_quantity").between(1, 50),
        "l_discount_range_0_0.1": F.col("l_discount").between(0.0, 0.1),
        "l_tax_cap_0.05": F.col("l_tax") <= 0.05,
        "l_returnflag_enum": F.col("l_returnflag").isin("A", "N", "R"),
    }
    _, bad = quarantine_split(li, checks)
    return bad.select("l_orderkey", "l_linenumber", "failed_rules")


@register(
    "k_anonymity",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       count(*) AS group_size,
       count(*) < 5 AS at_risk
FROM customer
GROUP BY 1, 2
""",
    survey="ext:privacy-k-anonymity",
    description="k-anonymity audit (k=5) over the "
    "(c_nationkey, c_mktsegment) quasi-identifier set: every "
    "equivalence class with its size and whether it re-identifies "
    "(size < k) — the release gate a curation pipeline runs on "
    "tables with demographic-ish columns, complementing pii_redact "
    "(contents) with a linkability check. One map-side-combined "
    "groupBy; output bounded by QI cardinality (<= 125 rows here) "
    "at any row count.",
)
def k_anonymity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import k_anonymity

    c = load_table(spark, sf_dir, "customer")
    return k_anonymity(c, ["c_nationkey", "c_mktsegment"], k=5)


@register(
    "table_profile",
    oracle="""
SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
       count(*) - count(o_orderkey) AS n_null,
       count(DISTINCT o_orderkey) AS n_distinct,
       round(min(o_orderkey) * 1.0, 6) AS min_num,
       round(max(o_orderkey) * 1.0, 6) AS max_num
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       count(DISTINCT o_custkey),
       round(min(o_custkey) * 1.0, 6), round(max(o_custkey) * 1.0, 6)
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
       count(DISTINCT o_totalprice),
       round(min(o_totalprice), 6), round(max(o_totalprice), 6)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
       count(DISTINCT o_orderdate), NULL, NULL
FROM orders
""",
    survey="ext:quality-table-profile",
    description="Column-profiling report over orders: per column, row "
    "count, null count, exact distinct count, and (numerics) min/max "
    "— the first command anyone runs against an unfamiliar table. "
    "ONE pass: every statistic is computed in a single wide "
    "aggregate (all map-side-combinable except the distincts) and "
    "unpivoted to the per-column frame with stack(); at 100 TB the "
    "exact count(DISTINCT) columns swap for approx_count_distinct "
    "exactly as approx_aggregates demonstrates, making the whole "
    "profile one scan + one 1-row-ish shuffle.",
)
def table_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    num = {"o_orderkey": True, "o_custkey": True, "o_totalprice": True,
           "o_orderstatus": False, "o_orderpriority": False,
           "o_orderdate": False}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if num[c]:
            aggs.append(F.round(F.min(c) * 1.0, 6).alias(f"mn_{c}"))
            aggs.append(F.round(F.max(c) * 1.0, 6).alias(f"mx_{c}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, "
        + (f"mn_{c}, mx_{c}" if num[c]
           else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)")
        for c in num
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(num)}, {stack_args})"
        " AS (col_name, nn, n_distinct, min_num, max_num)",
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("nn")).alias("n_null"),
        "n_distinct",
        "min_num",
        "max_num",
    )


@register(
    "benford_audit",
    oracle="""
WITH d AS (
  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                1, 1)::BIGINT AS digit
  FROM orders WHERE o_totalprice >= 1
), t AS (SELECT count(*) AS n FROM d)
SELECT digit,
       count(*) AS n_obs,
       round(count(*) * 1.0 / t.n, 6) AS obs_share,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
       round(abs(count(*) * 1.0 / t.n - log10(1.0 + 1.0 / digit)), 6)
         AS abs_dev
FROM d CROSS JOIN t
GROUP BY digit, t.n
""",
    survey="ext:quality-benford-audit",
    description="Benford first-digit audit of o_totalprice: observed "
    "leading-digit shares vs the Benford expectation log10(1 + 1/d) "
    "— the classic anomaly screen for fabricated or truncated "
    "numeric feeds. The first digit is extracted via integer→string "
    "(exact in every engine), NEVER via floating log10 of the value "
    "(log10(1000) is 2.999… in some libms — an engine-dependent "
    "digit flip). One scan-stage digit projection + a 9-row "
    "aggregate with a 1-row total broadcast.",
)
def benford_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    t = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        d.crossJoin(hint_small(t))
        .groupBy("digit", "n")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs") * 1.0 / F.col("n"), 6).alias(
                "obs_share"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias(
                "benford_share"
            ),
            F.round(
                F.abs(
                    F.col("n_obs") * 1.0 / F.col("n")
                    - F.log10(1.0 + 1.0 / F.col("digit"))
                ),
                6,
            ).alias("abs_dev"),
        )
    )
